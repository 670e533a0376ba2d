#!/usr/bin/env python
"""Fixed-corpus extractor evaluation CLI (the reference's eval-harness
surface, /root/reference/evals/runners/evaluation-runner.ts).

Usage:
    python tools/evaluate.py [sf_dir] [--sample N] [--broken]

Runs the deterministic judge over the eval corpus: ground truth = the
engine's reference extractor; candidate = the same extractor (expected
P/R 1.0, all PASS) or --broken, a deliberately degraded extractor that
drops every second provision and hallucinates a keyword (expected FAIL /
REVIEW rows — demonstrates the gate catches regressions). Prints one JSON
report line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def broken_extractor(doc: dict) -> dict:
    from decisions_knowledge_graph_data_ray.functions.document import extract_document

    rec = extract_document(doc)
    rec["cited_provisions"] = rec["cited_provisions"][::2]  # drop every 2nd
    rec["keywords"] = rec["keywords"] + ["hallucinated-term"]
    return rec


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    sample = 197
    if "--sample" in sys.argv:
        sample = int(sys.argv[sys.argv.index("--sample") + 1])
    use_broken = "--broken" in sys.argv

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from decisions_knowledge_graph_data_ray.evals import evaluate_extractor, summarize_evaluation
    from decisions_knowledge_graph_data_ray.pipelines.kg import read_transcripts
    from decisions_knowledge_graph_data_ray.stages.assemble import assemble_documents_salted

    docs = assemble_documents_salted(read_transcripts(sf_dir))
    verdicts = evaluate_extractor(
        docs,
        candidate_fn=broken_extractor if use_broken else None,
        sample_size=sample,
    )
    report = summarize_evaluation(verdicts)
    report["candidate"] = "broken_extractor" if use_broken else "reference"
    print(json.dumps(report, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
