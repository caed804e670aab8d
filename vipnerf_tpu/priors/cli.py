"""Offline prior-generation CLIs (reference workflow parity).

The reference ships prior generation as standalone per-dataset scripts run
before training (paths relative to /root/reference/):
`src/prior_generators/visibility/VisibilityMask0{1,2,5}_*.py` and
`src/prior_generators/sparse_depth/DepthEstimator0{1,2,5}_*.py`, each with a
`demo1()` hard-coding the dataset's constants (plane spacing, bounds, split
dir, resolution suffix) and running gen sets 2/3/4. Here the per-dataset
policy lives in one table and the generators are invoked as modules:

    python -m vipnerf_tpu.priors.visibility   --database NeRF_LLFF --gen_nums 2 3 4
    python -m vipnerf_tpu.priors.sparse_depth --database NeRF_LLFF --gen_nums 2 3 4

`gen_num` doubles as the train-set number (the reference pairs
gen_num == gen_set_num in every demo: VisibilityMask02_NeRF_LLFF.py:288-325,
DepthEstimator02_NeRF_LLFF.py:87-120).
"""

import argparse
from typing import Dict, List, Optional

# Per-dataset generation policy (reference demo constants):
# - NeRF_LLFF  (VisibilityMask02 :289-298, DepthEstimator02 :92-99):
#   scene_name keys, 'all' split, _down4 resolution, inverse-depth planes,
#   per-scene bounds from DepthBounds.csv.
# - RealEstate10K (VisibilityMask01 :233-236, DepthEstimator01): scene_num
#   keys, 'test' split, full resolution, inverse planes, fixed bounds [1,100].
# - DTU (VisibilityMask05 :38-40, 235-238, DepthEstimator05): scene_num keys,
#   'all' split, full resolution, LINEAR planes, fixed bounds [0.1, 5].
DATASET_POLICIES: Dict[str, Dict] = {
    "NeRF_LLFF": {
        "database_dirpath": "NeRF_LLFF/data",
        "scene_key": "scene_name",
        "split_dir": "all",
        "resolution_suffix": "_down4",
    },
    "RealEstate10K": {
        "database_dirpath": "RealEstate10K/data",
        "scene_key": "scene_num",
        "split_dir": "test",
        "resolution_suffix": "",
        "fixed_bounds": (1.0, 100.0),
    },
    "DTU": {
        "database_dirpath": "DTU/data",
        "num_depth_planes": 128,
        "scene_key": "scene_num",
        "split_dir": "all",
        "resolution_suffix": "",
        "fixed_bounds": (0.1, 5.0),
        "depth_planes_linear": True,
    },
}


def build_visibility_configs(database: str, gen_num: int,
                             set_num: Optional[int] = None) -> Dict:
    policy = DATASET_POLICIES[database]
    configs = {
        "generator": "vipnerf_tpu.priors.visibility",
        "gen_num": gen_num,
        "gen_set_num": set_num if set_num is not None else gen_num,
        "database_name": database,
        "database_dirpath": policy["database_dirpath"],
        "scene_key": policy["scene_key"],
        "split_dir": policy["split_dir"],
        # published VW02 artifacts: 64 planes (LLFF/RE), 128 (DTU) —
        # /root/reference/data/databases/*/data/*/visibility_prior/VW02/
        # Configs.json
        "num_depth_planes": policy.get("num_depth_planes", 64),
        "temperature": 10,
        "resolution_suffix": policy["resolution_suffix"],
    }
    if "fixed_bounds" in policy:
        configs["fixed_bounds"] = list(policy["fixed_bounds"])
    if policy.get("depth_planes_linear"):
        configs["depth_planes_linear"] = True
    return configs


def build_sparse_depth_configs(database: str, gen_num: int,
                               set_num: Optional[int] = None) -> Dict:
    policy = DATASET_POLICIES[database]
    return {
        "generator": "vipnerf_tpu.priors.sparse_depth",
        "gen_num": gen_num,
        "gen_set_num": set_num if set_num is not None else gen_num,
        "database_name": database,
        "database_dirpath": policy["database_dirpath"],
        "scene_key": policy["scene_key"],
        "split_dir": policy["split_dir"],
        "resolution_suffix": policy["resolution_suffix"],
    }


def _parse(prior_name: str, argv: Optional[List[str]]):
    parser = argparse.ArgumentParser(
        prog=f"python -m vipnerf_tpu.priors.{prior_name}",
        description=f"Generate the {prior_name} prior for a database "
                    "(reference offline workflow)",
    )
    parser.add_argument("--database", required=True,
                        choices=sorted(DATASET_POLICIES))
    parser.add_argument("--gen_nums", type=int, nargs="+", default=[2],
                        help="gen numbers == train-set numbers "
                             "(reference demos run 2 3 4)")
    parser.add_argument("--root_dirpath", default=".",
                        help="project root containing data/databases/")
    return parser.parse_args(argv)


def main_visibility(argv: Optional[List[str]] = None):
    from vipnerf_tpu.priors.visibility import start_generation

    args = _parse("visibility", argv)
    for gen_num in args.gen_nums:
        print(f"visibility prior: {args.database} VW{gen_num:02} "
              f"(set{gen_num:02})", flush=True)
        start_generation(
            build_visibility_configs(args.database, gen_num),
            root_dirpath=args.root_dirpath,
        )


def main_sparse_depth(argv: Optional[List[str]] = None):
    from vipnerf_tpu.priors.sparse_depth import start_generation

    args = _parse("sparse_depth", argv)
    for gen_num in args.gen_nums:
        print(f"sparse-depth prior: {args.database} DE{gen_num:02} "
              f"(set{gen_num:02})", flush=True)
        start_generation(
            build_sparse_depth_configs(args.database, gen_num),
            root_dirpath=args.root_dirpath,
        )
