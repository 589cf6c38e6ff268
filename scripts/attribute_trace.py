#!/usr/bin/python3
"""Join a jax.profiler trace with the dumped optimized HLO to attribute
device time to SOURCE-LEVEL owners (module path in op_name metadata), not
just XLA op-group names.  This is the tool behind BASELINE.md's train-step
floor table (VERDICT r4 #5: the diffuse 'everything else' bucket needed
named owners).

Usage: python scripts/attribute_trace.py <trace_dir> <hlo.txt> <B> <steps>
"""

import collections
import re
import sys

sys.path.insert(0, "/root/repo/scripts")

from analyze_trace_diff import load


def hlo_op_names(hlo_path):
    """op instance name -> (op_name metadata, source file:line)."""
    out = {}
    pat = re.compile(r"%([a-zA-Z0-9_.-]+) = .*?op_name=\"([^\"]+)\"")
    src = re.compile(r"source_file=\"([^\"]+)\" source_line=(\d+)")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                s = src.search(line)
                out[m.group(1)] = (m.group(2),
                                   f"{s.group(1)}:{s.group(2)}" if s else "")
    return out


OWNER_RULES = [
    # (regex on op_name metadata, owner label) — first match wins
    (r"frame_branch/(DilatedResidual|MSTCN|pallas|dilated)", "towers (fused stacks)"),
    (r"frame_branch/TorchDense_0.*(D -> C|dot_general)", "in_map dense (D->C) fwd+bwd"),
    (r"frame_branch", "towers (fused stacks)"),
    (r"scatter", "process_feature DUS (softmax tail write)"),
    (r"(cross_attn|sca_|mha)", "SCA cross-attn"),
    (r"(f2a|a2f)_layer", "X2Y f2a/a2f"),
    (r"(sa_layer|SA_|ffn)", "SA/FFN action sublayers"),
    (r"jit\(<unknown>\)/split", "flat-param views (split/reshape)"),
    (r"optax", "Adam fused update"),
    (r"(auction|bid|assignment)", "auction matcher"),
    (r"(loss|logsumexp|log_softmax|reduce_sum|smooth)", "losses"),
    (r"(gru|Bi_gru|seg_update)", "BiGRU / seg-update scan"),
    (r"blocks\.py:1[5-7][0-9]", "process_feature softmax/slice"),
    (r"sf_merge", "sf_merge split dense"),
    (r"segments\.py|bts,bs", "TDU segment pooling"),
    (r"transpose\(jvp\(FACT\)\)", "other backward glue"),
    (r"jvp\(FACT\)", "other forward glue"),
]


def owner_for(op_name, srcline=""):
    """Match against the op_name metadata AND the source file:line."""
    hay = op_name + " | " + srcline
    for pat, label in OWNER_RULES:
        if re.search(pat, hay, re.I):
            return label
    return "unattributed"


def main():
    trace_dir, hlo_path, B, steps = sys.argv[1:5]
    pv, _ = load(trace_dir, int(B), int(steps))
    names = hlo_op_names(hlo_path)
    owners = collections.Counter()
    unat = collections.Counter()
    for (base, name), ms_per_video in pv.items():
        ms = ms_per_video * int(B)
        meta, srcline = names.get(name, ("", ""))
        if not meta and base in ("copy", "copy-done", "copy-start"):
            owner = "param/activation copies (async)"
        elif not meta:
            owner = f"unattributed ({base})"
        else:
            owner = owner_for(meta, srcline)
            if owner == "unattributed":
                owner = f"unattributed ({base})"
        owners[owner] += ms
        if owner.startswith("unattributed"):
            unat[(name, meta[:100], srcline)] += ms
    total = sum(owners.values())
    print(f"device total {total:.2f} ms/step")
    for k, v in owners.most_common():
        print(f"  {v:7.3f} ms  {k}")
    print("\nlargest unattributed instances:")
    for (name, meta, srcline), v in unat.most_common(15):
        print(f"  {v:7.3f} ms  {name}  {meta}  {srcline}")


if __name__ == "__main__":
    main()
