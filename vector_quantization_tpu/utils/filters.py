"""Named-parameter filters — todd ``NamedParametersFilter`` semantics.

The reference selects parameter subsets by name for freezing, state-dict
filtering, and optimizer masking (``todd.models.FreezeMixin`` with
``NamedParametersFilter``/``NamedModulesFilter``; used e.g. at
``vq/tasks/image_tokenization/models/base.py:28``, ``configs/ar/x2i.py:18``).
Functionally here: a filter is a predicate over ``"/"``-joined param paths,
and helpers turn it into boolean mask trees / partitions of a params pytree.

Config form (anywhere a filter is accepted):

```python
dict(names=["encoder/conv_in/kernel"],   # exact paths
     prefixes=["decoder/"],              # path prefixes
     suffixes=["bias"],                  # path suffixes
     contains=["codebook"],              # substrings
     regexes=[r"layer\\d+_res\\d/conv\\d/kernel"])
```

A bare string is shorthand for ``contains=[s]``; a list of strings for
``contains=list``.
"""

from __future__ import annotations

import re
from typing import Any, Iterable, Mapping

import jax

__all__ = [
    "NamedParametersFilter",
    "path_str",
    "mask_tree",
    "partition_params",
    "filter_state_dict",
]


def path_str(path: Iterable[Any]) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "idx", None)
        if key is None:
            key = getattr(p, "name", p)
        parts.append(str(key))
    return "/".join(parts)


class NamedParametersFilter:
    def __init__(
        self,
        names: Iterable[str] = (),
        prefixes: Iterable[str] = (),
        suffixes: Iterable[str] = (),
        contains: Iterable[str] = (),
        regexes: Iterable[str] = (),
    ) -> None:
        self.names = set(names)
        self.prefixes = tuple(prefixes)
        self.suffixes = tuple(suffixes)
        self.contains = tuple(contains)
        self.regexes = [re.compile(r) for r in regexes]
        if not (
            self.names or self.prefixes or self.suffixes or self.contains
            or self.regexes
        ):
            raise ValueError("empty parameter filter matches nothing")

    @classmethod
    def build(cls, spec: "NamedParametersFilter | str | Iterable[str] | Mapping[str, Any]"):
        if isinstance(spec, cls):
            return spec
        if isinstance(spec, str):
            return cls(contains=[spec])
        if isinstance(spec, Mapping):
            return cls(**spec)
        return cls(contains=list(spec))

    def __call__(self, path: str) -> bool:
        if path in self.names:
            return True
        if any(path.startswith(p) for p in self.prefixes):
            return True
        if any(path.endswith(s) for s in self.suffixes):
            return True
        if any(c in path for c in self.contains):
            return True
        return any(r.search(path) for r in self.regexes)


def mask_tree(params: Any, filt, value: bool = True) -> Any:
    """Boolean pytree: ``value`` where the filter matches, ``not value``
    elsewhere (optax.masked-compatible)."""
    f = NamedParametersFilter.build(filt)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: value if f(path_str(path)) else not value, params
    )


def partition_params(params: Any, filt) -> tuple[dict, dict]:
    """Flat ``{path: leaf}`` split into (matched, rest) — the FreezeMixin
    partition (frozen vs trainable)."""
    f = NamedParametersFilter.build(filt)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    matched, rest = {}, {}
    for path, leaf in flat:
        s = path_str(path)
        (matched if f(s) else rest)[s] = leaf
    return matched, rest


def filter_state_dict(params: Any, filt) -> dict:
    """Flat ``{path: leaf}`` of just the matching params (reference
    ``filter_state_dict``)."""
    return partition_params(params, filt)[0]
