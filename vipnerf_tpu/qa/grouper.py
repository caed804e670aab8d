"""Scene-wise grouping of frame-wise QA scores.

Parity target: src/qa/00_Common/src/SceneWiseGrouper.py:17-34 (paths relative
to /root/reference/): group each *_FrameWise.csv by all non-frame columns,
mean the metric, round to 4 -> *_SceneWise.csv.
"""

from pathlib import Path

import pandas as pd


def get_grouped_qa_scores(qa_data: pd.DataFrame) -> pd.DataFrame:
    final_columns = [x for x in qa_data.columns if x != "pred_frame_num"]
    group_columns = list(qa_data)[:-2]
    grouped = qa_data.groupby(by=group_columns).mean().reset_index()[final_columns]
    return grouped.round({final_columns[-1]: 4})


def group_qa_dir(qa_dirpath: Path) -> None:
    """Group every *_FrameWise.csv under one QA_Scores dir into its
    *_SceneWise.csv sibling (the single place the naming contract lives)."""
    for pred_dirpath in sorted(Path(qa_dirpath).iterdir()):
        for qa_filepath in sorted(pred_dirpath.glob("*_FrameWise.csv")):
            qa_data = pd.read_csv(qa_filepath)
            grouped = get_grouped_qa_scores(qa_data)
            out = qa_filepath.parent / f"{qa_filepath.stem[:-9]}SceneWise.csv"
            grouped.to_csv(out, index=False)


def group_qa_scores(testing_dirpath: Path, test_nums: list):
    for test_num in test_nums:
        qa_dirpath = Path(testing_dirpath) / f"test{test_num:04}/QA_Scores"
        if not qa_dirpath.exists():
            continue
        group_qa_dir(qa_dirpath)
