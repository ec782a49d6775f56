"""Copy-paste hygiene: no source file may be >=0.6 difflib-similar to a
same-named reference file (VERDICT round-1 class (a) regression guard).

Skips when /root/reference is not mounted (e.g. CI outside the build
image)."""
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.mark.skipif(not Path("/root/reference").exists(), reason="reference tree not mounted")
def test_no_file_exceeds_similarity_threshold():
    from selfcheck_similarity import sweep

    flagged = [r for r in sweep() if r["flagged"]]
    assert not flagged, "files too similar to reference (rewrite, don't copy):\n" + "\n".join(
        f"  {r['ratio']:.3f} {r['file']} vs {r['ref']}" for r in flagged
    )
