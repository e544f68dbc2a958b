"""Common sketch contract + self-describing serialization.

Blob layout: ``magic(4s) | type_tag(B) | version(B) | header_len(I) |
header json utf-8 | payload arrays``.  A type registry dispatches
``from_bytes`` so heterogeneous sketch blobs can live in one BinaryType
column (one DataFrame of mixed sketches per metric, e.g. in checkpoints).
"""

from __future__ import annotations

import json
import struct
from typing import Any, ClassVar

import numpy as np

MAGIC = b"SKH1"
_HEADER_FMT = "<4sBBI"
_REGISTRY: dict[int, type["Sketch"]] = {}


class Sketch:
    """Base class: subclasses set TYPE_TAG and implement the five methods
    (_header/_payload/_from_parts, update, merge) plus their estimators."""

    TYPE_TAG: ClassVar[int] = 0

    def __init_subclass__(cls, **kw: Any) -> None:
        super().__init_subclass__(**kw)
        if cls.TYPE_TAG:
            _REGISTRY[cls.TYPE_TAG] = cls

    # -- subclass surface ------------------------------------------------
    def _header(self) -> dict[str, Any]:
        raise NotImplementedError

    def _payload(self) -> list[np.ndarray]:
        raise NotImplementedError

    @classmethod
    def _from_parts(cls, header: dict[str, Any], buf: memoryview) -> "Sketch":
        raise NotImplementedError

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        raise NotImplementedError

    def merge(self, other: "Sketch") -> "Sketch":
        raise NotImplementedError

    # -- shared ----------------------------------------------------------
    def _check_merge(self, other: "Sketch") -> None:
        """Unlike the reference's buggy &&-joined compatibility check
        (src/gqf.c:2438-2444), require full parameter equality."""
        if type(self) is not type(other) or self._header() != other._header():
            raise ValueError(
                f"cannot merge {type(self).__name__}({self._header()}) with "
                f"{type(other).__name__}({other._header()})"
            )

    def to_bytes(self) -> bytes:
        head = json.dumps(self._header(), sort_keys=True).encode()
        out = [struct.pack(_HEADER_FMT, MAGIC, self.TYPE_TAG, 1, len(head)), head]
        for arr in self._payload():
            out.append(np.ascontiguousarray(arr).tobytes())
        return b"".join(out)

    @classmethod
    def merge_many(cls, sketches: list["Sketch"]) -> "Sketch":
        if not sketches:
            raise ValueError("nothing to merge")
        acc = sketches[0]
        for s in sketches[1:]:
            acc = acc.merge(s)
        return acc


def from_bytes(data: bytes) -> Sketch:
    hsize = struct.calcsize(_HEADER_FMT)
    if len(data) < hsize:
        raise ValueError("truncated sketch blob")
    magic, tag, version, hlen = struct.unpack_from(_HEADER_FMT, data, 0)
    if magic != MAGIC or version != 1:
        raise ValueError(f"bad sketch blob (magic={magic!r}, version={version})")
    if tag not in _REGISTRY:
        raise ValueError(f"unknown sketch type tag {tag}")
    if len(data) < hsize + hlen:
        raise ValueError("truncated sketch blob header")
    try:
        header = json.loads(data[hsize : hsize + hlen].decode())
        return _REGISTRY[tag]._from_parts(header, memoryview(data)[hsize + hlen :])
    except (ValueError, KeyError) as e:
        raise ValueError(f"corrupt sketch blob: {e}") from e
