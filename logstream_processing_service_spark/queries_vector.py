"""Vector queries — filled in by the vector/similarity layer."""
