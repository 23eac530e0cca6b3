#!/usr/bin/env python3
"""Faithful stdlib twin of the reference's validation hot loop
(reference: validator.py:176-209 driven by main.py:77-87): three dict/set
lookups per symbol, single-threaded, over the same 267,300-symbol universe
that graft.CpcScaleBench validates with broadcast joins.

Run: python3 tools/reference_loop_bench.py
"""
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class ValidationResult:
    """Per-row result object, constructed exactly like the reference's
    (reference: validator.py:19-42)."""
    symbol_valid: bool = False
    in_symbol_list: bool = False
    validity_status: str = "UNKNOWN"
    schema_valid: bool = False
    parent_symbol: Optional[str] = None
    validation_warnings: List[str] = field(default_factory=list)

SECTIONS = "ABCDEFGHY"
NCLASSES = 99
SUBS = "BCD"
NGROUPS = 100

def universe():
    out = []
    for si, sec in enumerate(SECTIONS):
        for cls in range(NCLASSES):
            for sub in SUBS:
                subclass = f"{sec}{cls:02d}{sub}"
                for grp in range(NGROUPS):
                    out.append((f"{subclass}{grp}/00", subclass))
    return out

def main():
    uni = universe()
    symbols = [s for s, _ in uni]
    valid_symbols = set()
    validity_status = {}
    schema_hierarchy = {}
    for i, (sym, parent) in enumerate(uni):
        if i % 1000 != 0:
            valid_symbols.add(sym)
            validity_status[sym] = "ACTIVE"
        if i % 10 == 0:
            validity_status[sym] = "ACTIVE"  # validity-file overwrite
        schema_hierarchy[sym] = parent
        schema_hierarchy[parent] = parent[:3]

    def is_valid_format(symbol):
        if not symbol:
            return False
        if not symbol[0].isalpha() or symbol[0] not in "ABCDEFGHY":
            return False
        if len(symbol) >= 3 and not symbol[1:3].isdigit():
            return False
        return True

    t0 = time.time()
    invalid = 0
    for symbol in symbols:
        result = ValidationResult()
        if is_valid_format(symbol):
            result.symbol_valid = True
        else:
            result.validation_warnings.append("Invalid symbol format")
        if symbol in valid_symbols:
            result.in_symbol_list = True
        else:
            result.validation_warnings.append("Symbol not found in symbol list")
        result.validity_status = validity_status.get(symbol, "UNKNOWN")
        if result.validity_status != "ACTIVE":
            result.validation_warnings.append(f"Symbol status: {result.validity_status}")
        parent = schema_hierarchy.get(symbol)
        if parent:
            result.schema_valid = True
            result.parent_symbol = parent
        else:
            result.validation_warnings.append("Symbol not found in schema hierarchy")
        if not (result.symbol_valid and result.in_symbol_list
                and result.validity_status == "ACTIVE"):
            invalid += 1
    secs = time.time() - t0
    print(f"reference-style loop: {len(symbols)} symbols in {secs:.2f} s "
          f"({len(symbols)/secs/1e3:.0f}k symbols/s), invalid={invalid}")

if __name__ == "__main__":
    main()
