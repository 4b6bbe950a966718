"""Device compute ops: delegate reductions, attention, top-k, image ops."""
