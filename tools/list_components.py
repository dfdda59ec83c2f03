"""`otelcol components` analog: list every available component type
(otelcol/command_components.go — print the factory registry as YAML,
with stability per signal; here the engine is logs-shaped so stability
is reported once per component).

    python tools/list_components.py
    python tools/list_components.py --json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def component_inventory() -> dict:
    from opentelemetry_collector_spark.plans import config as cfg_mod
    from opentelemetry_collector_spark.plans import featuregate

    return {
        "buildinfo": {"command": "otelcol-spark", "description": "PySpark-native collector engine"},
        "receivers": list(cfg_mod.RECEIVER_TYPES),
        "processors": list(cfg_mod.PROCESSOR_TYPES),
        "exporters": list(cfg_mod.EXPORTER_TYPES),
        "connectors": list(cfg_mod.CONNECTOR_TYPES),
        "featuregates": {
            g.gate_id: {"stage": g.stage, "enabled": g.enabled, "description": g.description}
            for g in featuregate.REGISTRY.gates.values()
        },
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true", help="JSON instead of YAML")
    args = ap.parse_args()
    inv = component_inventory()
    if args.json:
        print(json.dumps(inv, indent=2))
    else:
        import yaml

        print(yaml.safe_dump(inv, sort_keys=False), end="")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
