"""Command-line entry points (reference L7: train/evaluate/inference)."""
