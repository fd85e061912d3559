#!/bin/bash
# Round adversarial gate: build the edge-case fixture, run the full
# differential against it, and write ADVERSARIAL_r<N>.json at the repo
# root so NaN/unicode/dup/null-coordinate robustness is a recorded
# artifact instead of a manual loop. Usage: tools/adversarial_gate.sh <round>
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: adversarial_gate.sh <round-number>}"
python3 tools/make_adversarial.py
tools/run.sh graft.Verify /tmp/sfadv /tmp/vadv
python3 tools/compare.py /tmp/sfadv /tmp/vadv --json "ADVERSARIAL_r${ROUND}.json"
