"""Multi-cycle loop with map maintenance at capacity (VERDICT r5 #4).

Three out-and-back traversals of the long-loop scene (CI-sized frames)
drive the map through repeated revisits, landmark compaction, and loop
closures. Asserts:
  * capacity-saturation counters are clean (no silent truncation of
    extraction buffers, pose-graph nodes, or edges);
  * compaction actually ran (landmark id space stays bounded);
  * the sim3-aligned ATE holds a drift bound over the whole multi-loop.
"""

import numpy as np
import pytest

from sift_tpu.slam.pipeline import SfmPipeline
from sift_tpu.eval.ate import ate_rmse
from tests.e2e.test_image_sfm import _render, _cfg, INTR, STEP


@pytest.mark.slow
def test_multi_loop_compaction_and_saturation():
    n_out = 20
    cycle = ([STEP * i for i in range(n_out)]
             + [STEP * (n_out - 2 - i) for i in range(n_out - 1)])
    txs = list(cycle)
    for _ in range(2):                      # 3 traversals total
        txs += [t + STEP for t in cycle[:-1]]
    frames = [_render(t) for t in txs]
    cfg = _cfg().replace(chunked_tracking=True, ba_async=True,
                         enable_loop_closure=True, pose_graph_sim3=True,
                         loop_min_inliers=25, loop_max_rmse=2.0,
                         compact_interval_kf=8, track_saturation=True,
                         window_size=8)
    pipe = SfmPipeline(INTR, cfg)
    results = pipe.process_sequence(frames, batch=8)

    assert pipe.state == "tracking"
    tracked = np.asarray([bool(r["tracked"]) for r in results])
    assert tracked.mean() > 0.8, tracked.mean()

    # Saturation audit: nothing silently dropped, capacities not pinned.
    assert pipe.chunk_stats.get("extract_dropped", 0) == 0, \
        pipe.chunk_stats
    assert len(pipe.keyframes) < cfg.max_pose_graph_nodes, \
        (len(pipe.keyframes), cfg.max_pose_graph_nodes)
    assert len(pipe.pose_edges) < cfg.max_pose_graph_edges

    # Compaction kept the landmark table bounded: repeated traversals of
    # the same ~2.2 m of scene must not grow the map linearly with time.
    n_lms = pipe.landmarks.shape[0]
    assert n_lms < 12000, n_lms

    gt = np.stack([[t, 0.0, 0.0] for t in txs])
    est = pipe.positions()
    ate = ate_rmse(est[tracked], gt[tracked], align=True, with_scale=True)
    assert ate < 0.08, (ate, len(pipe.keyframes), pipe.num_loop_closures)
