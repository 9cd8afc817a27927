"""Assemble the combined semantic model from the vendored module JSONs.

Capability parity with reference ``sap_model_assembly.py:17-86`` (merge
shared metadata + 10 module files into one model dict), re-implemented:
module order comes from an explicit manifest (not glob patterns), the
result is returned as a dict for in-process use (callers may also dump it
with ``--write``), and per-module table/column counts are computed for the
summary the CLI prints.
"""

from __future__ import annotations

import json
import os

MODULES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "modules")

# assembly (file-merge) order: FI_* first, then logistics, then HCM; each
# entry is a vendored file in MODULES_DIR. Note the metadata-level
# modules_covered list is emitted ALPHABETICALLY to match the reference's
# combined artifact exactly — file-merge order and that list differ.
_MODULE_FILES = [
    "sap_model_fi_ap.json",
    "sap_model_fi_ar.json",
    "sap_model_fi_gl.json",
    "sap_model_co.json",
    "sap_model_mm.json",
    "sap_model_sd.json",
    "sap_model_hr.json",
    "sap_model_pay.json",
    "sap_model_ben.json",
    "sap_model_pm.json",
]
_SHARED_FILE = "sap_model_shared.json"


def module_files(base_dir: str = MODULES_DIR) -> list[str]:
    return [os.path.join(base_dir, f) for f in _MODULE_FILES]


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def assemble(base_dir: str = MODULES_DIR) -> dict:
    """Merge shared metadata + module files into the combined model dict."""
    shared = _load(os.path.join(base_dir, _SHARED_FILE))
    model = {
        "model_metadata": dict(shared.get("model_metadata") or {}),
        "shared_reference_objects": shared.get("shared_reference_objects") or {},
        "modules": {},
        "cross_module_relationships": shared.get("cross_module_relationships") or [],
        "nl_query_patterns": shared.get("nl_query_patterns") or [],
        "sql_generation_guidelines": shared.get("sql_generation_guidelines") or [],
    }
    for path in module_files(base_dir):
        mod = _load(path)
        key = mod["module_key"]
        # module payload may sit under its own key or at the file root
        data = mod.get(key, mod)

        def pick(field: str):
            return data.get(field, mod.get(field, "" if field != "business_objects" else {}))

        model["modules"][key] = {
            "module_name": pick("module_name"),
            "description": pick("description"),
            "application_short_name": pick("application_short_name"),
            "business_objects": pick("business_objects"),
        }
    # sorted: the reference's combined artifact lists modules_covered
    # alphabetically (BEN, CO, ...), independent of assembly order
    model["model_metadata"]["modules_covered"] = sorted(model["modules"].keys())
    return model


def summarize(model: dict) -> dict:
    tables = columns = 0
    for mod in model["modules"].values():
        for bo in (mod.get("business_objects") or {}).values():
            for t in (bo.get("tables") or {}).values():
                tables += 1
                columns += len(t.get("business_columns") or [])
    return {
        "modules": len(model["modules"]),
        "tables": tables,
        "columns": columns,
        "relationships": len(model["cross_module_relationships"]),
        "patterns": len(model["nl_query_patterns"]),
        "guidelines": len(model["sql_generation_guidelines"]),
    }


def main() -> None:
    import sys

    model = assemble()
    if "--write" in sys.argv:
        out = sys.argv[sys.argv.index("--write") + 1]
        with open(out, "w") as f:
            json.dump(model, f, indent=2)
        print(f"wrote {out}")
    for k, v in summarize(model).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
