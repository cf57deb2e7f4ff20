"""Jitted train steps, optimizers, LR schedules."""
