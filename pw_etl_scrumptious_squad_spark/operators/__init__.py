"""Relational + extension operators, all pure DataFrame -> DataFrame."""
