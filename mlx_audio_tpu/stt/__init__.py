"""Speech-to-text task package."""
