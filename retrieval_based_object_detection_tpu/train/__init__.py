"""Training: fine-tune the CLIP tower / classification head on product crops."""
