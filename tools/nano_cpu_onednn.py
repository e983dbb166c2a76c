"""Close VERDICT r4 item 6: attempt the XLA:CPU oneDNN / XNNPACK / ISA
levers on the nano-CPU config and record the measured result either way.

This build's XLA:CPU exposes the flags (confirmed by binary scan):
  --xla_cpu_use_onednn          route supported HLO to oneDNN kernels
  --xla_cpu_use_xnnpack         route supported HLO to XNNPACK kernels
  --xla_cpu_experimental_onednn_fusion_type=...   (dot|eltwise|...)
  --xla_cpu_experimental_xnn_graph_fusion_mode=...
  --xla_cpu_max_isa=...         cap/raise the ISA (AVX512 etc.)

Runs bench.py's --nano-cpu-child (the exact BASELINE-config-1 workload:
Nano decode 500 tokens + fused meanflow vocode, f32) under each flag set
in a fresh subprocess and reports min-wall xrt per variant. Every variant
uses its own compile-cache subdirectory so a cached baseline executable
can't mask a flag's effect.

The ROADMAP P1 question this answers: is XLA:CPU's default emitter
leaving oneDNN-sized speed on the table for the decode's (1,d)x(d,4d)
GEMVs and the vocode's convs, on this host?

Usage:  python tools/nano_cpu_onednn.py [--variants N]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("default", ""),
    ("onednn", "--xla_cpu_use_onednn=true"),
    ("onednn_fus", "--xla_cpu_use_onednn=true "
                   "--xla_cpu_experimental_onednn_fusion_type=dot "
                   "--xla_cpu_experimental_onednn_fusion_type=eltwise"),
    ("xnnpack", "--xla_cpu_use_xnnpack=true"),
    ("xnn_graph", "--xla_cpu_use_xnnpack=true "
                  "--xla_cpu_experimental_xnn_graph_fusion_mode="
                  "XNN_GRAPH_FUSION_MODE_GREEDY_SLINKY"),
]


def main():
    results = {}
    for name, flags in VARIANTS:
        env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=flags,
                   CHATTERBOX_BENCH_CACHE_DIR=os.path.join(
                       "/tmp", f"nano_onednn_cache_{name}"))
        print(f"=== {name}: XLA_FLAGS={flags!r}", file=sys.stderr)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--nano-cpu-child"],
            env=env, capture_output=True, text=True, timeout=1800)
        sys.stderr.write(out.stderr[-1500:] + "\n")
        if out.returncode != 0:
            print(f"{name}: FAILED rc={out.returncode}", file=sys.stderr)
            results[name] = None
            continue
        data = json.loads(out.stdout.strip().splitlines()[-1])
        results[name] = data["nano_cpu_xrt"]
        print(f"{name}: {data['nano_cpu_xrt']:.3f} xrt", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
