"""Small utilities (reference ``utils.py:3-7``)."""

from __future__ import annotations


def print_obj(obj, logger=None) -> None:
    """Dump an object's ``__dict__`` (reference ``print_obj``)."""
    emit = logger.info if logger is not None else print
    for k, v in vars(obj).items():
        emit(f"{k}: {v}")
