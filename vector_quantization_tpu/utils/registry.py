"""Hierarchical registries with build pre-hooks.

TPU-native analogue of todd's registry metaclass as used by the reference
(``vq/registries.py:9-34``; recursive ``build_pre_hook`` chains at
``vq/tasks/image_tokenization/models/base.py:62-87``): components self-register
under a registry tree, configs name them by ``type`` (optionally a dotted
registry path like ``'VQModelRegistry.VQGAN'``), and ``build()`` resolves the
class, runs its ``build_pre_hook`` classmethod (if any) to pre-build children /
infer shapes, and instantiates it.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, TypeVar

from .config import Config

T = TypeVar("T")

__all__ = ["Registry", "RegistryError"]


class RegistryError(KeyError):
    pass


class Registry:
    """A named registry that can hold items and child registries."""

    _roots: dict[str, "Registry"] = {}

    def __init__(self, name: str, parent: "Registry | None" = None) -> None:
        self.name = name
        self.parent = parent
        self._items: dict[str, Any] = {}
        self._children: dict[str, "Registry"] = {}
        if parent is None:
            Registry._roots[name] = self
        else:
            parent._children[name] = self

    # -- structure ---------------------------------------------------------

    def child(self, name: str) -> "Registry":
        if name not in self._children:
            Registry(name, parent=self)
        return self._children[name]

    @property
    def root(self) -> "Registry":
        node = self
        while node.parent is not None:
            node = node.parent
        return node

    def qualname(self) -> str:
        parts = []
        node: Registry | None = self
        while node is not None:
            parts.append(node.name)
            node = node.parent
        return ".".join(reversed(parts))

    # -- registration ------------------------------------------------------

    def register(
        self, name: str | None = None, *, force: bool = False
    ) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            key = name or getattr(obj, "__name__", None)
            if key is None:
                raise ValueError("cannot infer registry key")
            if key in self._items and not force:
                raise RegistryError(
                    f"{key!r} already registered in {self.qualname()}"
                )
            self._items[key] = obj
            return obj

        return deco

    def register_(self, obj: T, name: str | None = None) -> T:
        return self.register(name)(obj)

    # -- lookup ------------------------------------------------------------

    def get(self, path: str) -> Any:
        """Resolve ``'Name'`` or ``'Child.Name'`` or ``'RootName.Child.Name'``."""
        parts = path.split(".")
        node: Registry = self
        # allow absolute paths that start at any root
        if len(parts) > 1 and parts[0] in Registry._roots:
            node = Registry._roots[parts[0]]
            parts = parts[1:]
        for part in parts[:-1]:
            if part in node._children:
                node = node._children[part]
            else:
                raise RegistryError(
                    f"no child registry {part!r} under {node.qualname()}"
                )
        key = parts[-1]
        found = node._lookup(key)
        if found is None:
            raise RegistryError(
                f"{key!r} not found under {node.qualname()} "
                f"(known: {sorted(node.keys())})"
            )
        return found

    def _lookup(self, key: str) -> Any:
        if key in self._items:
            return self._items[key]
        for ch in self._children.values():
            found = ch._lookup(key)
            if found is not None:
                return found
        return None

    def keys(self) -> list[str]:
        out = list(self._items)
        for ch in self._children.values():
            out.extend(ch.keys())
        return out

    def __contains__(self, key: str) -> bool:
        try:
            self.get(key)
            return True
        except RegistryError:
            return False

    # -- build -------------------------------------------------------------

    def build(self, config: Mapping[str, Any] | None, **extra: Any) -> Any:
        """Instantiate ``config['type']`` with the remaining keys as kwargs.

        Runs the class's ``build_pre_hook(config, registry)`` classmethod
        first (if defined) so it can pre-build children and infer shapes —
        the reference's recursive pre-hook chain.
        """
        if config is None:
            raise ValueError(f"{self.qualname()}.build(None)")
        cfg = Config.from_obj(dict(config))
        cfg.merge(extra)
        type_path = cfg.pop("type", None)
        if type_path is None:
            raise ValueError(
                f"{self.qualname()}.build: config missing 'type': {cfg}"
            )
        cls = self.get(type_path) if isinstance(type_path, str) else type_path
        pre_hook = getattr(cls, "build_pre_hook", None)
        if pre_hook is not None:
            cfg = pre_hook(cfg, self)
        return cls(**cfg)

    def build_or_return(self, obj: Any, **extra: Any) -> Any:
        if isinstance(obj, Mapping) and "type" in obj:
            return self.build(obj, **extra)
        return obj
