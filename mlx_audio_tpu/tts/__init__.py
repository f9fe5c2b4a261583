"""Text-to-speech task package."""
