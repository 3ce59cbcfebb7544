"""Execute the cfm_tpu-side code snippets in docs/MIGRATION.md.

The migration guide promises its snippets run against the library as
written; this test extracts every fenced ``python`` block, skips the
TorchCFM-side illustrations (anything mentioning torch), shortens the one
long training loop, and runs the rest sequentially in a single namespace —
so later snippets may use names defined by earlier ones, exactly as a
reader following the guide top-to-bottom would have them.

Reference role: the torchcfm README/tutorial snippets are exercised by its
notebook CI (conditional-flow-matching/.github/workflows/test.yaml).
"""

import re
from pathlib import Path

DOC = Path(__file__).resolve().parent.parent / "docs" / "MIGRATION.md"

_FENCE = re.compile(r"```python\n(.*?)```", re.DOTALL)


def _snippets():
    text = DOC.read_text()
    blocks = _FENCE.findall(text)
    assert blocks, "no python blocks found in MIGRATION.md"
    out = []
    for b in blocks:
        if "torchcfm" in b or "torch." in b or b.lstrip().startswith("# TorchCFM"):
            continue  # TorchCFM-side illustration
        # The tutorial loop is 20k steps; 3 is enough to prove it runs.
        out.append(b.replace("range(20000)", "range(3)"))
    return out


def test_migration_snippets():
    snippets = _snippets()
    # The guide's executable spine: matchers, manual loop, packaged step,
    # UNet constructor, odeint, data-parallel step, checkpoint round-trip.
    assert len(snippets) >= 7, f"expected >=7 executable snippets, got {len(snippets)}"
    ns: dict = {}
    for i, src in enumerate(snippets):
        try:
            exec(compile(src, f"{DOC.name}[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            raise AssertionError(
                f"MIGRATION.md snippet {i} failed: {e}\n--- snippet ---\n{src}"
            ) from e
    # The guide's loop actually trained: a finite scalar loss came out.
    assert float(ns["loss"]) == float(ns["loss"])
    assert float(ns["metrics"]["loss"]) > 0.0
