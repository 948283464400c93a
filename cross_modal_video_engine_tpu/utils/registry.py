"""String-keyed component registries.

The reference uses three incompatible registry systems (mmcv registries in
MCT, `NAME_TO_MODELS` in LINAS-engine/model.py:1007, `NAME_TO_SIM` in
LINAS-engine/loss.py:76, `NAME_TO_ENCODER` in util/text2vec.py:118).  We use
one small registry class for all of them so the reference's string keys keep
working (`get_model('dual_encoding')`, `get_sim('cosine')`, ...).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional


class Registry:
    """A name -> constructor mapping with decorator-style registration."""

    def __init__(self, name: str):
        self.name = name
        self._items: Dict[str, Any] = {}

    def register(self, key: Optional[str] = None) -> Callable:
        def deco(obj):
            k = key if key is not None else getattr(obj, "__name__", str(obj))
            if k in self._items:
                raise KeyError(f"{k!r} already registered in {self.name}")
            self._items[k] = obj
            return obj

        return deco

    def register_value(self, key: str, value: Any) -> None:
        if key in self._items:
            raise KeyError(f"{key!r} already registered in {self.name}")
        self._items[key] = value

    def get(self, key: str) -> Any:
        if key not in self._items:
            raise KeyError(
                f"{key!r} not found in registry {self.name}; "
                f"available: {sorted(self._items)}"
            )
        return self._items[key]

    def __contains__(self, key: str) -> bool:
        return key in self._items

    def __iter__(self) -> Iterator[str]:
        return iter(self._items)

    def keys(self):
        return self._items.keys()


MODELS = Registry("models")
BACKBONES = Registry("backbones")
HEADS = Registry("heads")
RECOGNIZERS = Registry("recognizers")
LOSSES = Registry("losses")
SIMILARITIES = Registry("similarities")
TEXT_ENCODERS = Registry("text_encoders")
PIPELINES = Registry("pipelines")
DATASETS = Registry("datasets")
