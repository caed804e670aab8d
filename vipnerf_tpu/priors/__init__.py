"""Offline prior generators: dense visibility (plane-sweep photometric
consistency, jitted JAX) and sparse depth (external COLMAP triangulation)."""
