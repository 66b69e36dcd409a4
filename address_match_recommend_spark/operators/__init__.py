"""Distributed operators: one module per pipeline stage."""
