"""Checkpoint / resume / lineage layer (SURVEY.md §4 'checkpoint/resume').

Replaces the reference's single-file model+history checkpoints
(/root/reference/rex/tasks/base_task.py:122-232) with the dataflow
equivalent: per-partition output directories with ``_SUCCESS`` markers
and lineage manifests, so a failed 100 TB run skips finished partitions
on resume instead of replaying the world.
"""

from rex_ray.state.checkpoint import (  # noqa: F401
    Partition,
    load_manifest,
    plan_id_ranges,
    read_output,
    run_resumable,
    write_artifact,
    read_artifact,
)
