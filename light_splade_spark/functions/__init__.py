"""Scalar / columnar functions: analyzers, hashing, vbyte codecs, text quality."""
