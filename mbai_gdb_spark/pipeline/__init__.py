"""Reference-parity game pipeline (EP2 of SURVEY.md §3).

Stages, in dependency order (reference: src/managers/game.py:52-122):

1. ``periods``    — period boundaries from marker rows (A1/A2/W2).
2. ``lineups``    — stateful lineup reconstruction kernel (W11,
                    applyInPandas — the one genuinely procedural op).
3. ``stints``     — lineup-stint durations via lead() (W3/W4), player
                    stints via gaps-and-islands (W5), cross-period NEXT
                    chains (W6).
4. ``actions``    — event shaping (P5), containment joins to stints
                    (J3-J6), rebound as-of attribution with claim-once
                    (J7/J8), global action NEXT chain (W7).
5. ``scores``     — running score chain with per-period reset (W8/W9).
6. ``plus_minus`` — per-stint conditional sums + player rollup (A4/A5;
                    implements the *intended* semantics — the reference's
                    own SET_PLUS_MINUS is disabled/broken, SURVEY §2.11).

Every stage is DataFrame-in/DataFrame-out, partition-keyed by game_id —
the unit of parallelism that scales to a full 100 TB season corpus.
"""
