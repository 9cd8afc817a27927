"""Vendored semantic model + assembler.

``modules/`` holds the per-module model JSONs — pure DATA (the business
metadata the engine must share with the reference for parity: tables,
columns, relationships, NL patterns, SQL guidelines), vendored so the
engine boots with no reference checkout present. ``assembly.assemble()``
merges them into the combined model dict (capability parity with reference
``sap_model_assembly.py:17-86``, re-implemented).
"""

from .assembly import MODULES_DIR, assemble, module_files

__all__ = ["MODULES_DIR", "assemble", "module_files"]
