"""Voice-activity detection / diarization task package."""
