"""Per-family probe factories for tools/scale_probe.py (round-8 split)."""
