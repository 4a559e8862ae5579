#!/bin/bash
# Multi-JVM correctness gate: run the WHOLE declared catalog plus a
# store fold + CDC cycle under local-cluster[2,4,4096] (each executor a
# separate JVM — see graft.tools.ClusterProbe), then run the same DuckDB
# oracle compare the driver uses against the multi-JVM results.
# Usage: scripts/cluster_verify.sh [sfDir] [outDir]
set -euo pipefail
DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_cluster_verify}"
# the in-process standalone Worker builds executor commands without
# load-spark-env.sh, so the scala version must come from the environment
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
export SPARK_SCALA_VERSION=2.13
sbt -batch "Test/runMain graft.tools.ClusterProbe $DIR $OUT"
python3 "$(dirname "$0")/check.py" "$DIR" "$OUT"
