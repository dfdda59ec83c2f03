"""Feature gate registry (featuregate/registry.go:55-96 analog).

The reference gates behavior switches behind a global registry with
lifecycle stages: Alpha (default off), Beta (default on), Stable
(always on — disabling errors, gate.go stage semantics), Deprecated
(always off — enabling errors). Users flip gates with the
``--feature-gates=gate1,-gate2`` flag syntax (flag.go).

Here the registry is an ordinary object (a module-level default is
provided) consumed by config assembly; gates are plain booleans by the
time a plan is built, so Catalyst never sees them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

ALPHA = "alpha"
BETA = "beta"
STABLE = "stable"
DEPRECATED = "deprecated"

_DEFAULT_ENABLED = {ALPHA: False, BETA: True, STABLE: True, DEPRECATED: False}


class GateError(ValueError):
    pass


@dataclass
class Gate:
    gate_id: str
    stage: str
    description: str = ""
    enabled: bool = False


@dataclass
class Registry:
    gates: dict[str, Gate] = field(default_factory=dict)

    def register(self, gate_id: str, stage: str, description: str = "") -> Gate:
        """MustRegister semantics: duplicate ids and unknown stages are
        errors (registry.go:55-74)."""
        if gate_id in self.gates:
            raise GateError(f"feature gate {gate_id!r} is already registered")
        if stage not in _DEFAULT_ENABLED:
            raise GateError(f"unknown feature-gate stage {stage!r} for {gate_id!r}")
        g = Gate(gate_id, stage, description, _DEFAULT_ENABLED[stage])
        self.gates[gate_id] = g
        return g

    def set(self, gate_id: str, enabled: bool) -> None:
        """registry.go Set: Stable cannot be disabled, Deprecated cannot
        be enabled, unknown ids error."""
        g = self.gates.get(gate_id)
        if g is None:
            raise GateError(f"no such feature gate {gate_id!r}")
        if g.stage == STABLE and not enabled:
            raise GateError(f"feature gate {gate_id!r} is stable, cannot be disabled")
        if g.stage == DEPRECATED and enabled:
            raise GateError(
                f"feature gate {gate_id!r} is deprecated, cannot be enabled"
            )
        g.enabled = enabled

    def is_enabled(self, gate_id: str) -> bool:
        g = self.gates.get(gate_id)
        if g is None:
            raise GateError(f"no such feature gate {gate_id!r}")
        return g.enabled

    def apply_flags(self, spec: str) -> None:
        """--feature-gates flag syntax: comma-separated ids, '-' prefix
        disables, optional '+' prefix enables (flag.go)."""
        for tok in filter(None, (t.strip() for t in spec.split(","))):
            if tok.startswith("-"):
                self.set(tok[1:], False)
            elif tok.startswith("+"):
                self.set(tok[1:], True)
            else:
                self.set(tok, True)


def default_registry() -> Registry:
    """The engine's own gates (the global registry analog)."""
    r = Registry()
    r.register(
        "engine.arrowParse",
        ALPHA,
        "use the Arrow-vectorized parse UDF instead of native regex "
        "expressions when a config omits the parse method",
    )
    r.register(
        "engine.saltedAggregation",
        ALPHA,
        "salt hot conv_id keys before the flagship aggregate "
        "(AQE map-side partial aggregation already absorbs fixture skew)",
    )
    r.register(
        "confmap.enableMergeAppendOption",
        ALPHA,
        "multi-config merge appends+dedups lists instead of replacing "
        "them (confmap/internal/conf.go mergeAppend)",
    )
    r.register(
        "service.profilesSupport",
        ALPHA,
        "allow profiles-signal pipelines in service.pipelines "
        "(service/pipelines/config.go ServiceProfilesSupportFeatureGate)",
    )
    r.register(
        "engine.singlePassFanout",
        BETA,
        "write all sinks in one partitionBy(sink) pass instead of "
        "per-sink units (coarser resume granularity, zero extra shuffles)",
    )
    return r


REGISTRY = default_registry()
