"""Checkpoint IO: Orbax-native save/restore + PyTorch reference converter."""
