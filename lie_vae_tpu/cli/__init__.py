"""CLI entry points (reference: lie_vae/experiments/main.py)."""
