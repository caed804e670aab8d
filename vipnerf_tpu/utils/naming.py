"""Canonical on-disk naming shared across the pipeline.

The reference keys numeric-id datasets (RealEstate10K, DTU) by zero-padded
scene numbers (f'{scene_num:05}', e.g. DtuTrainerTester01.py:57,80-81) and
name-keyed datasets (NeRF-LLFF) by the scene name verbatim. Training, testing,
QA, prior generation, and the database builders must all agree on this rule —
it lives here once.
"""


def scene_dirname(scene_id, scene_key: str = "scene_name") -> str:
    """Directory name for a scene id under database_data/ and run trees."""
    if scene_key == "scene_num":
        return f"{int(scene_id):05}"
    return str(scene_id)
