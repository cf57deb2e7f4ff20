"""Flax-style pure-functional model cores and task models."""
