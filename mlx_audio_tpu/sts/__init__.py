"""Speech-to-speech task package (separation, enhancement, voice pipeline)."""
