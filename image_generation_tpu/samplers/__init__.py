"""Sampler backends (the annealer-replacement layer)."""
