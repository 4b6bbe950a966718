"""Model zoo: CLIP image tower, detection head, SAM-style segmenter."""
