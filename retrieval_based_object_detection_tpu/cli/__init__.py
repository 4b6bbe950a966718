"""Command-line entry points mirroring the reference's numbered scripts."""
