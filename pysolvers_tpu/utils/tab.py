"""Nested-output indentation helper.

Capability parity with the reference's external PyTab package (``Tab``),
used to visually indent nested-solver iteration logs (e.g. Newton indents
around the inner linear solve, reference Nonlinear/Newton.py:76-78).
"""
from __future__ import annotations


class Tab:
    _depth = 0

    def __init__(self, width: int = 2):
        self.width = width

    def __str__(self):
        return " " * (Tab._depth * self.width)

    def __enter__(self):
        Tab._depth += 1
        return self

    def __exit__(self, *exc):
        Tab._depth = max(0, Tab._depth - 1)
        return False

    @classmethod
    def indented(cls, msg: str, width: int = 2) -> str:
        return " " * (cls._depth * width) + msg
