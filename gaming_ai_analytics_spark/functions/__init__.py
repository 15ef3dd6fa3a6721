"""Scalar/vector function library: text analysis, vector math, scorers."""
