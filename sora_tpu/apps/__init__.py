"""Application layer: the reference exe suite as importable CLIs."""
