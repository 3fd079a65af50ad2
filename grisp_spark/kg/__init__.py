"""Knowledge-graph construction pipeline (the grisp-semantics core).

Stages (see pipeline.py): normalize → mention detection (vectorized
gazetteer scan) → candidate generation + anchor-prior/context scoring
→ canonicalization (connected components over surface-form
equivalence edges) → per-turn-window triple extraction → graph
materialization, with per-partition lineage checkpoints and
resume-from-partition.
"""
