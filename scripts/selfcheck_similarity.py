#!/usr/bin/env python
"""Similarity self-check vs the read-only reference tree.

Sweeps every source file in this repo against the same-named file in
/root/reference (by basename match anywhere in its tree) and reports
difflib ratios, flagging pairs >= the threshold. Constant-table files
whose content IS the data (scenario tables, tiny CLI shell scripts) can
be allowlisted with a justification.

Run directly (``python scripts/selfcheck_similarity.py``) or via
tests/test_selfcheck_similarity.py so (a)-class regressions fail CI.
"""
import argparse
import difflib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
THRESHOLD = 0.60

# Files where high similarity is inherent to the content, each with the
# reason (mirrors VERDICT round-1 adjudication class (b)).
ALLOWLIST = {
    "src/pd_fusion/evaluation/scenarios.py": "canonical 6-scenario constant table; the data IS the file",
}


def _normalize(text: str):
    lines = []
    for ln in text.splitlines():
        s = ln.strip()
        if not s or s.startswith("#"):
            continue
        lines.append(s)
    return lines


def _ref_index():
    idx = {}
    for p in REFERENCE.rglob("*"):
        if p.suffix in {".py", ".sh", ".cpp", ".cu", ".c", ".h"} and p.is_file():
            idx.setdefault(p.name, []).append(p)
    return idx


def sweep(threshold=THRESHOLD):
    ref_idx = _ref_index()
    results = []
    for sub in ("src", "scripts"):
        for p in sorted((REPO / sub).rglob("*")):
            if not p.is_file() or p.suffix not in {".py", ".sh", ".cpp"}:
                continue
            rel = str(p.relative_to(REPO))
            candidates = ref_idx.get(p.name, [])
            best, best_ref = 0.0, None
            mine = _normalize(p.read_text(errors="replace"))
            if not mine:
                continue
            for rp in candidates:
                theirs = _normalize(rp.read_text(errors="replace"))
                if not theirs:
                    continue
                r = difflib.SequenceMatcher(a=mine, b=theirs).ratio()
                if r > best:
                    best, best_ref = r, str(rp)
            results.append(
                {
                    "file": rel,
                    "ratio": round(best, 3),
                    "ref": best_ref,
                    "flagged": best >= threshold and rel not in ALLOWLIST,
                    "allowlisted": rel in ALLOWLIST,
                }
            )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=THRESHOLD)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    results = sweep(args.threshold)
    flagged = [r for r in results if r["flagged"]]
    if args.json:
        print(json.dumps({"threshold": args.threshold, "flagged": flagged,
                          "n_checked": len(results)}))
    else:
        for r in sorted(results, key=lambda r: -r["ratio"])[:20]:
            mark = "FLAG" if r["flagged"] else ("allow" if r["allowlisted"] else "  ok")
            print(f"{mark}  {r['ratio']:.3f}  {r['file']}")
        print(f"\n{len(results)} files checked, {len(flagged)} flagged "
              f"at threshold {args.threshold}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
