"""Estimation models: structs-of-arrays factor graphs (2D pose-landmark, 3D)."""
