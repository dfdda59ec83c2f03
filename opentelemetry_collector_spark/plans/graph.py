"""Pipeline graph: config validation before execution.

The reference builds a gonum DAG from config and rejects bad
topologies with readable errors (service/internal/graph/graph.go:
78-97 createNodes/createEdges, cycle detection :751-789, connector
signal-pair validation :166-187). Our plan is a DataFrame composition,
but config-level validation is still worth reproducing: catch cycles,
dangling references, and type mismatches *before* Catalyst sees
anything.

Node kinds mirror the component model: receiver → processor* →
(connector | exporter); a connector is an exporter of pipeline A and a
receiver of pipeline B (graph.go:144-201).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class GraphError(ValueError):
    pass


@dataclass(frozen=True)
class Node:
    name: str
    kind: str  # receiver | processor | connector | exporter


@dataclass
class PipelineGraph:
    nodes: dict[str, Node] = field(default_factory=dict)
    edges: list[tuple[str, str]] = field(default_factory=list)

    def add(self, name: str, kind: str) -> None:
        if kind not in ("receiver", "processor", "connector", "exporter"):
            raise GraphError(f"unknown component kind {kind!r} for {name!r}")
        if name in self.nodes:
            raise GraphError(f"duplicate component name {name!r}")
        self.nodes[name] = Node(name, kind)

    def connect(self, src: str, dst: str) -> None:
        for n in (src, dst):
            if n not in self.nodes:
                raise GraphError(f"edge references unknown component {n!r}")
        s, d = self.nodes[src], self.nodes[dst]
        if s.kind == "exporter":
            raise GraphError(f"exporter {src!r} cannot have downstream consumers")
        if d.kind == "receiver":
            raise GraphError(f"receiver {dst!r} cannot be a downstream consumer")
        self.edges.append((src, dst))

    def validate(self) -> list[str]:
        """Cycle check + orphan check; returns a topological order.

        Mirrors graph.Build's TopoSort error path (graph.go:751-789):
        the cycle error names the components on the cycle.
        """
        out: dict[str, list[str]] = {n: [] for n in self.nodes}
        indeg: dict[str, int] = {n: 0 for n in self.nodes}
        for s, d in self.edges:
            out[s].append(d)
            indeg[d] += 1
        ready = sorted(n for n, k in indeg.items() if k == 0)
        order: list[str] = []
        while ready:
            n = ready.pop(0)
            order.append(n)
            for d in sorted(out[n]):
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
            ready.sort()
        if len(order) != len(self.nodes):
            # Kahn's algorithm leaves cycle members AND everything
            # downstream of them unprocessed — name both honestly
            cyc = sorted(n for n in self.nodes if n not in order)
            raise GraphError(
                f"cycle detected in pipeline graph (cycle members and "
                f"components downstream of the cycle): {cyc}"
            )
        for name, node in self.nodes.items():
            has_out = any(s == name for s, _ in self.edges)
            has_in = any(d == name for _, d in self.edges)
            if node.kind == "receiver" and not has_out:
                raise GraphError(f"receiver {name!r} feeds no pipeline")
            if node.kind == "exporter" and not has_in:
                raise GraphError(f"exporter {name!r} is not fed by any pipeline")
            if node.kind in ("processor", "connector") and not (has_in and has_out):
                raise GraphError(f"{node.kind} {name!r} must have both input and output")
        return order
