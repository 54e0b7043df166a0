#!/usr/bin/env bash
# Loaded-bench hog harness: 16 CPU busy loops + 4 disk-writer loops.
#
# The disk writers are REQUIRED for a faithful self-check: the r8 driver
# bench measured 3.13x at a HEAD where 16 CPU-only hogs measured 0.99x —
# the driver's contention regime is disk-I/O starvation (shuffle/spill on
# a contended /tmp), which busy loops cannot reproduce. Each writer cycles
# 64 MiB fsync'd dd passes on the DISK tmp volume (deliberately NOT
# /dev/shm — the engine routes shuffle through Scratch.localDir's
# shm-first policy precisely to be insulated from this volume).
#
# Usage: scripts/hogs.sh [seconds]   # default 600; self-terminates
set -u
DUR="${1:-600}"
HOGTMP="${GRAFT_HOG_DIR:-/tmp}"
for i in $(seq 1 16); do
  (timeout "$DUR" sh -c 'while :; do :; done' >/dev/null 2>&1 &)
done
for i in $(seq 1 4); do
  (timeout "$DUR" sh -c '
     f='"$HOGTMP"'/graft_hog_$$.bin
     trap "rm -f \"$f\"; exit 0" TERM INT EXIT
     while :; do dd if=/dev/zero of="$f" bs=1M count=64 conv=fsync 2>/dev/null; done
   ' >/dev/null 2>&1 &)
done
echo "hogs: 16 cpu busy loops + 4 disk writers (64MiB fsync dd cycles on $HOGTMP) for ${DUR}s"
