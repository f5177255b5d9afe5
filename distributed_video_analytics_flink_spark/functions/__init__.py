"""Scalar / vectorized function library."""
