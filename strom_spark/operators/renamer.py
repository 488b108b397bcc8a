"""Renamer: rename flow keys (reference ``lib/renamer.ex:16-37``) —
pure map manipulation, no processes, no plan change."""

from __future__ import annotations

from typing import Mapping, Sequence

from ..component import Component
from ..flow import Flow


class Renamer(Component):
    def __init__(self, renames: Mapping[str, str], *, label: str | None = None):
        self.renames = dict(renames)
        self.label = label

    def transform(self, flow: Flow) -> Flow:
        adds = {}
        for old, new in self.renames.items():
            adds[new] = flow[old]
        return flow.without(*self.renames).updated(adds)

    def input_names(self) -> Sequence[str]:
        return tuple(self.renames)

    def output_names(self) -> Sequence[str]:
        return tuple(self.renames.values())
