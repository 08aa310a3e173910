"""Boolean/int env-knob parsing shared by every ``MVLT_*`` flag site.

The ``MVLT_*`` knobs are kill switches and opt-ins around kernel paths
(see README "Env knob matrix").  All boolean knobs parse through
:func:`env_flag` so ``MVLT_STOREP=0`` means OFF — bare string truthiness
would read any non-empty value (including ``"0"``/``"false"``) as on.
"""

from __future__ import annotations

import os

_FALSY = ("", "0", "false", "no", "off")


def env_flag(name: str) -> bool:
    """True iff env var ``name`` is set to a truthy value.

    Unset, empty, ``0``, ``false``, ``no``, ``off`` (case-insensitive)
    are all False; anything else (``1``, ``true``, ...) is True.
    """
    return os.environ.get(name, "").strip().lower() not in _FALSY


def env_int(name: str, default: int) -> int:
    """Integer env knob, read PER CALL (not latched at import)."""
    raw = os.environ.get(name, "").strip()
    if not raw:
        return default
    return int(raw)
