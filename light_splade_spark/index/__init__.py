"""Inverted-index build (salted two-phase, VByte, block-max) + WAND query."""
