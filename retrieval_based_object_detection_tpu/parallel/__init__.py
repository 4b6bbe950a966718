"""Mesh construction and sharding rules (dp/tp for the model, shard-axis
for the gallery). The reference has no distributed execution at all
(SURVEY.md §2 audit); these are the TPU-native scaling axes that replace
its single-process loops and external Qdrant server."""
