"""Language-identification task package."""
