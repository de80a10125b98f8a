"""Checkpoint manipulation tools (reference model/apply_delta.py,
make_delta.py, consolidate.py and scripts/ equivalents)."""
