"""`otelcol validate` analog: load + validate a pipeline config without
running anything (otelcol/command_validate.go — resolve the config,
build the component graph, exit non-zero with a readable error).

    python tools/validate_config.py config.yaml
    python tools/validate_config.py --legacy config.yaml   # single-pipeline shape

By default validation resolves ${env:…}/${yaml:…} references only —
file reads and http(s) fetches are disabled so validating an untrusted
config cannot touch the filesystem or the network (the resolver is
recursive, so even an env var VALUE could smuggle a ${file:…}).
Opt back in with --allow-schemes env,file,yaml,http,https.

Exit codes: 0 valid, 1 invalid (error printed to stderr), 2 unreadable.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "config", nargs="+",
        help="YAML config path(s) — multiple sources merge in order, "
        "later wins (maps join recursively; list behavior per the "
        "confmap.enableMergeAppendOption gate)",
    )
    ap.add_argument(
        "--legacy",
        action="store_true",
        help="validate the single-pipeline (processors-list) shape",
    )
    ap.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        dest="sets",
        help="config override applied before validation, highest "
        "precedence (otelcol --set analog; repeatable, maps join, "
        "scalars/arrays override)",
    )
    ap.add_argument(
        "--feature-gates",
        default="",
        help="comma-separated gate ids, '-' prefix disables — needed to "
        "validate gated surfaces (e.g. service.profilesSupport for "
        "profiles pipelines), same syntax as submit_pipeline",
    )
    ap.add_argument(
        "--allow-schemes",
        default="env,yaml",
        help="comma-separated ${scheme:…} providers to resolve during "
        "validation (default: env,yaml — no file/network access)",
    )
    args = ap.parse_args()

    import yaml

    from opentelemetry_collector_spark.plans import config as cfg_mod
    from opentelemetry_collector_spark.plans.graph import GraphError

    allowed = frozenset(
        t.strip() for t in args.allow_schemes.split(",") if t.strip()
    )
    raws = []
    for path in args.config:
        try:
            with open(path) as f:
                raws.append(yaml.safe_load(f) or {})
        except (OSError, yaml.YAMLError) as e:
            print(f"cannot read config: {e}", file=sys.stderr)
            return 2
    if args.feature_gates:
        from opentelemetry_collector_spark.plans import featuregate

        try:
            featuregate.REGISTRY.apply_flags(args.feature_gates)
        except featuregate.GateError as e:
            print(f"invalid configuration: {e}", file=sys.stderr)
            return 1
    try:
        raw = cfg_mod.merge_configs(raws)
        if args.sets:
            raw = cfg_mod.apply_set_overrides(raw, args.sets)
        if args.legacy:
            spec = cfg_mod.load_spec(raw, allowed_schemes=allowed)
            cfg_mod.build_graph(spec)
        else:
            svc = cfg_mod.load_service(raw, allowed_schemes=allowed)
            cfg_mod.build_service_graph(svc)
        print(f"{' + '.join(args.config)}: valid")
        return 0
    except (cfg_mod.ConfigError, GraphError) as e:
        print(f"invalid configuration: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
