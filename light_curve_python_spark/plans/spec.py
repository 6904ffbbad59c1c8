"""FeatureSpec — the engine's serializable logical plan.

The reference's extractor objects are immutable, picklable, and JSON
round-trippable (to_json at /root/reference/light-curve/src/features.rs:
2533-2559, JSONDeserializedFeature at :5006-5059, pickle at :2656-2686).
The engine mirrors that: a FeatureSpec is a plain-dict description of the
kernel list + params + bands + fill value, shipped to executors inside the
UDF closure (picklable for spark-submit --py-files) and to disk as JSON for
resume (pairs with plans/checkpoint.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List, Optional

from ..functions.kernels import KERNEL_FACTORIES
from ..operators.extract import FeatureExtractor

__all__ = ["FeatureSpec"]


@dataclass(frozen=True)
class FeatureSpec:
    features: List[dict] = field(default_factory=list)
    # each: {"name": str, "params": dict}
    fill_value: Optional[float] = float("nan")
    bands: Optional[List[str]] = None
    transforms: Optional[dict] = None

    def __post_init__(self):
        from ..functions.kernels import ensure_lazy_factories
        # own copies: the spec is advertised immutable, so normalization
        # below must not write through to caller-supplied dicts
        feats = [{"name": f["name"], "params": dict(f.get("params", {}))}
                 for f in self.features]
        object.__setattr__(self, "features", feats)
        for f in feats:
            ensure_lazy_factories(f["name"])
            if f["name"] not in KERNEL_FACTORIES:
                raise ValueError(f"unknown feature: {f['name']}")
            f.setdefault("params", {})   # hand-authored entries may omit it
            # resolve the fast/direct choice at construction time so the
            # serialized spec always pins the evaluator explicitly: a fresh
            # spec round-trips to itself (fast=True, the factory default)
            # while a pre-upgrade manifest string (no "fast" key) stays
            # distinguishable and is pinned to the direct evaluator in
            # from_json — _check_manifest_compatible then refuses to mix them
            if f["name"] == "periodogram" and "fast" not in f["params"]:
                f["params"]["fast"] = True

    # ---- construction ------------------------------------------------------

    @classmethod
    def of(cls, *names_or_tuples, fill_value=float("nan"), bands=None,
           transforms=None) -> "FeatureSpec":
        feats = []
        for x in names_or_tuples:
            if isinstance(x, str):
                feats.append({"name": x, "params": {}})
            else:
                name, params = x
                feats.append({"name": name, "params": dict(params)})
        return cls(feats, fill_value, bands, transforms)

    # ---- serialization -----------------------------------------------------

    def to_json(self) -> str:
        return json.dumps({
            "version": 1,
            "features": self.features,
            "fill_value": self.fill_value,
            "bands": self.bands,
            "transforms": self.transforms,
        }, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "FeatureSpec":
        d = json.loads(s)
        if d.get("version") != 1:
            raise ValueError(f"unsupported spec version: {d.get('version')}")
        for f in d["features"]:
            f.setdefault("params", {})   # hand-authored manifests may omit it
            if f["name"] == "periodogram" and "fast" not in f["params"]:
                # specs serialized before the factory default flipped to
                # fast=True were computed with the direct evaluator; pin it
                # so a CheckpointedRun resumed across the upgrade doesn't
                # mix evaluators between buckets of one output table
                f["params"]["fast"] = False
        return cls(d["features"], d["fill_value"], d["bands"],
                   d["transforms"])

    # ---- compilation -------------------------------------------------------

    def to_extractor(self) -> FeatureExtractor:
        return FeatureExtractor(
            [(f["name"], f["params"]) for f in self.features],
            fill_value=self.fill_value, bands=self.bands,
            transforms=self.transforms)

    @property
    def names(self) -> List[str]:
        return self.to_extractor().names
