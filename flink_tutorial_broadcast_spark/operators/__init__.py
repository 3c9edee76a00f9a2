"""Operator modules; each registers queries into the registry on import."""
