"""Name -> factory registries.

Replaces the reference's `eval(...)`-based class dispatch
(/root/reference/train_audio.py:32,56 and
datasets/augmentation_factory.py:214-217) — a documented deviation
(SURVEY.md section 7.5): string evaluation is replaced with explicit
registries.
"""

from __future__ import annotations

from typing import Dict, Generic, Iterator, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self._kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str, item: T = None):
        """Register `item` under `name`; usable as a decorator."""
        if item is not None:
            self._register(name, item)
            return item

        def deco(fn: T) -> T:
            self._register(name, fn)
            return fn

        return deco

    def _register(self, name: str, item: T) -> None:
        if name in self._items:
            raise KeyError(f"{self._kind} {name!r} already registered")
        self._items[name] = item

    def get(self, name: str) -> T:
        if name not in self._items:
            raise KeyError(
                f"Unknown {self._kind} {name!r}. Available: {sorted(self._items)}"
            )
        return self._items[name]

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def __iter__(self) -> Iterator[str]:
        return iter(sorted(self._items))

    def names(self):
        return sorted(self._items)
