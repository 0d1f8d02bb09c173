"""Environment-variable backed feature flags.

TPU-native analogue of the reference's ``vq/utils/stores.py:5-10`` (todd
``StoreMeta``): a tiny class whose attributes read from environment variables at
access time, so ``DRY_RUN=True python -m ...`` shrinks runs the same way the
reference's smoke mode does.
"""

from __future__ import annotations

import os
from typing import Any

_TRUTHY = {"1", "true", "yes", "on"}


def _env(name: str, default: Any = None) -> Any:
    raw = os.environ.get(name)
    if raw is None:
        return default
    if isinstance(default, bool) or default is None:
        return raw.strip().lower() in _TRUTHY
    return type(default)(raw)


class _StoreMeta(type):
    """Metaclass exposing env vars as live class attributes."""

    _DEFAULTS: dict[str, Any] = {}

    def __getattr__(cls, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        defaults = cls.__dict__.get("_DEFAULTS", {})
        if name in defaults:
            return _env(name, defaults[name])
        raise AttributeError(name)


class Store(metaclass=_StoreMeta):
    """Global env flags (read fresh on every access).

    - ``DRY_RUN``: shrink every pipeline to a minutes-long smoke run.
    - ``DEBUG``: enable extra asserts (e.g. cross-device sync checks).
    - ``PRETRAINED``: root directory holding converted pretrained weights.
    """

    _DEFAULTS = {
        "DRY_RUN": False,
        "DEBUG": False,
        "PRETRAINED": "pretrained",
    }
