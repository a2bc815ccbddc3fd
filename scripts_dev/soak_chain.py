"""Manifest read-chain soak: ``save_state_version`` appends one level
per touched frame, so the merge-on-read reload plan grows one
broadcast-anti per fold. This soak runs N alternating folds
(add/remove of the zones datasource — delta-sized every time) against
one snapshot root in two arms:

* ``raw``    — NO compaction: measures reload latency + merged-count
  latency as the chain grows to N levels.
* ``policy`` — ``maintain_state_versions(max_chain=8)`` after every
  save: the auto-compaction that bounds the chain (and thus reload
  cost) regardless of fold count.

Both arms end with a value-identity check against a from-scratch build
of the same final state. Output: one table row per fold (chain length,
reload seconds) + the closing identity verdict per arm.

Usage: python scripts_dev/soak_chain.py [folds] [sf_dir]
       (default: 50 /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from grebi_spark.incremental import (  # noqa: E402
    add_datasource,
    build_graph_stateful,
    load_state_current,
    maintain_state_versions,
    remove_datasource,
    save_state_version,
    state_chain_length,
)
from grebi_spark.plans.parity import (  # noqa: E402
    INC_CONFIG,
    _star_graph_long,
    _zone_source,
)
from grebi_spark.session import get_spark  # noqa: E402


def _canon_count(state) -> int:
    return state.graph.merged.count()


def run_arm(spark, sf_dir: str, folds: int, policy: bool) -> None:
    name = "policy" if policy else "raw"
    customers, nations, regions = _star_graph_long(spark, sf_dir)
    zones = _zone_source(spark, sf_dir).localCheckpoint()
    state = build_graph_stateful([customers, nations, regions], INC_CONFIG)
    root = tempfile.mkdtemp(prefix=f"soak_chain_{name}_")
    save_state_version(state, root)

    samples = []
    for i in range(folds):
        st = load_state_current(spark, root)
        st2 = (
            add_datasource(st, zones)
            if i % 2 == 0
            else remove_datasource(st, "map")
        )
        save_state_version(st2, root)
        if policy:
            maintain_state_versions(spark, root, max_chain=8)
        chain = state_chain_length(spark, root)
        t0 = time.time()
        cur = load_state_current(spark, root)
        n = _canon_count(cur)
        t_reload = time.time() - t0
        samples.append((i + 1, chain, t_reload, n))
        if (i + 1) % 5 == 0 or i == folds - 1:
            print(
                f"SOAK-CHAIN [{name}] fold {i+1:3d}: chain={chain:3d} "
                f"reload+count={t_reload:6.2f}s merged={n}",
                flush=True,
            )

    # value identity: final reload ≡ from-scratch build of the same state
    final = load_state_current(spark, root)
    ref = build_graph_stateful([customers, nations, regions], INC_CONFIG)
    if folds % 2 == 1:  # odd fold count ends on an 'add'
        ref = add_datasource(ref, zones)
    a = final.graph.merged.orderBy(
        "node_id", "prop_key", "value"
    ).collect()
    b = ref.graph.merged.orderBy("node_id", "prop_key", "value").collect()
    ident = [r.asDict() for r in a] == [r.asDict() for r in b]
    first5 = samples[:5]
    last5 = samples[-5:]
    avg = lambda xs: sum(x[2] for x in xs) / len(xs)  # noqa: E731
    print(
        f"SOAK-CHAIN [{name}] DONE: folds={folds} "
        f"final_chain={samples[-1][1]} "
        f"reload first5={avg(first5):.2f}s last5={avg(last5):.2f}s "
        f"growth={avg(last5)/max(avg(first5),1e-9):.2f}x "
        f"value-identity={ident}",
        flush=True,
    )


def main() -> None:
    folds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    arm = sys.argv[3] if len(sys.argv) > 3 else "both"  # raw|policy|both
    spark = get_spark("soak_chain", shuffle_partitions=32)
    arms = {"raw": (False,), "policy": (True,), "both": (False, True)}[arm]
    for policy in arms:
        run_arm(spark, sf_dir, folds, policy)


if __name__ == "__main__":
    main()
