#!/bin/bash
# Round-10 hardening trio (VERDICT r9 next #2/#3/#4), one command:
#   1. SpillProbe  — volume-heavy queries exact under 1 GiB executors
#                    with the spill paths provably firing (local-cluster).
#   2. SkewProbe   — adversarial viral-template corpus through the
#                    dedup/LSH joins: task-time histogram bound (<=4x
#                    stage median) on the capped/salted production paths,
#                    component-equality of the giant-bucket chain cap.
#   3. PipelineKillProbe — the full chain (replay fold -> streaming
#                    corpus-index maintenance -> dedup/decontaminate ->
#                    Release.run) killed hard (halt) twice mid-stream
#                    across real process boundaries, resumed from
#                    checkpoints, release artifact equal to a never-killed
#                    control.
# Usage: scripts/hardening.sh [sfDir-small] [sfDir-big]
set -euo pipefail
SMALL="${1:-/root/testdata/sf0.001}"
BIG="${2:-/root/testdata/sf0.1}"
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION=2.13
sbt -batch "Test/runMain graft.tools.SpillProbe $BIG 10"
sbt -batch "Test/runMain graft.tools.SkewProbe $BIG 10 1000"
sbt -batch "Test/runMain graft.tools.PipelineKillProbe $SMALL"
# 4. ConcurrencyProbe — 8 writers x 50 versions of mixed full/upsert/
#    delete commits racing ONE store root: exactly-one-winner per
#    version, serial-replay equality, bounded retries (r11).
sbt -batch "Test/runMain graft.tools.ConcurrencyProbe 8 50"
echo "[hardening] all four probes green"
