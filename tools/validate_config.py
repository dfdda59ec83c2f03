"""`otelcol validate` analog: load + validate a pipeline config without
running anything (otelcol/command_validate.go — resolve the config,
build the component graph, exit non-zero with a readable error).

    python tools/validate_config.py config.yaml
    python tools/validate_config.py --legacy config.yaml   # single-pipeline shape

Exit codes: 0 valid, 1 invalid (error printed to stderr), 2 unreadable.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="YAML config path")
    ap.add_argument(
        "--legacy",
        action="store_true",
        help="validate the single-pipeline (processors-list) shape",
    )
    args = ap.parse_args()

    import yaml

    from opentelemetry_collector_spark.plans import config as cfg_mod
    from opentelemetry_collector_spark.plans.graph import GraphError

    try:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
    except (OSError, yaml.YAMLError) as e:
        print(f"cannot read config: {e}", file=sys.stderr)
        return 2
    try:
        if args.legacy:
            spec = cfg_mod.load_spec(raw)
            cfg_mod.build_graph(spec)
        else:
            svc = cfg_mod.load_service(raw)
            cfg_mod.build_service_graph(svc)
        print(f"{args.config}: valid")
        return 0
    except (cfg_mod.ConfigError, GraphError) as e:
        print(f"invalid configuration: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
