#!/usr/bin/env python3
"""Preflight op-coverage audit for the native ONNX runtime.

The reference's data prep runs two frozen external graphs through
onnxruntime — campplus (speaker embedding) and the S3 speech tokenizer
(reference cosyvoice/cli/frontend.py:54-63).  cosy_tpu executes them through
its own ingestion runtime (compat/onnx.py); this tool parses any ``.onnx``
file and diffs its op set against the runtime's dispatch table BEFORE
execution, so a coverage gap is reported as a clean inventory instead of a
mid-graph NotImplementedError.

    python tools/onnx_coverage.py model.onnx [more.onnx ...]

Exit 0 when every op in every graph is supported, 1 otherwise.  See
docs/onnx_coverage.md for the expected op inventories of the campplus / S3
tokenizer export recipes.
"""

from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cosy_tpu.compat.onnx import parse_model, supported_ops  # noqa: E402


def audit_graph(data: bytes):
    """(op -> count, unsupported op -> count, subgraph-attr op names)."""
    graph, opset = parse_model(data)
    counts = collections.Counter(n.op_type for n in graph.nodes)
    sup = supported_ops()
    unsupported = {op: c for op, c in counts.items() if op not in sup}
    # control-flow ops carry subgraphs the wire reader does not descend
    # into (compat/onnx.py: graph attrs unsupported) — flag them explicitly
    control_flow = sorted(set(counts) & {"If", "Loop", "Scan"})
    return counts, unsupported, control_flow, opset


def audit_file(path: str) -> bool:
    with open(path, "rb") as f:
        data = f.read()
    counts, unsupported, control_flow, opset = audit_graph(data)
    n_nodes = sum(counts.values())
    print(f"{path}: opset {opset}, {n_nodes} nodes, {len(counts)} distinct ops")
    for op in sorted(counts):
        mark = "OK " if op not in unsupported else "MISSING"
        print(f"  [{mark}] {op:<24} x{counts[op]}")
    if control_flow:
        print(f"  note: control-flow ops {control_flow} carry subgraphs the "
              f"audit does not descend into")
    if unsupported:
        print(f"  -> {len(unsupported)} unsupported op type(s): "
              f"{sorted(unsupported)} — extend compat/onnx.py _exec or use "
              f"onnxruntime for this graph")
        return False
    print("  -> all ops supported")
    return True


def main(argv):
    if not argv:
        print(__doc__)
        return 2
    ok = True
    for path in argv:
        ok = audit_file(path) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
