"""Distribution layer — NEW capability relative to the reference (which has
no distributed backend; its multi-GPU story is one host thread per device,
SURVEY.md §2.7).  Mesh axes:

- ``data``: read-batch / problem-batch data parallelism (pure DP; merging is
  concatenation, bit-identical by construction),
- ``rep``: minimizer-index sharding by sorted representation blocks (the
  lookup-table TP analog),
- ``sp``: ring-wavefront sequence parallelism (one problem's DP matrix
  sharded by target stripes, frontier cells passed over the ring — see
  ring_nw.py; for pairs too long for one core).
"""

from .mesh import make_mesh, local_device_count, axis_meshes
from .shard import (sharded_anchors, sharded_banded_nw, sharded_match_chain,
                    sharded_poa)
from .manifest import map_all_vs_all_resumable
from .ring_nw import ring_wavefront_nw
from .shard_output import (map_all_vs_all_sharded, merge_sharded_rows,
                           write_merged_paf)
from .multihost import (initialize_distributed, make_global_mesh,
                        process_count, process_index)

__all__ = ["make_mesh", "local_device_count", "axis_meshes",
           "sharded_anchors", "sharded_banded_nw",
           "sharded_match_chain", "sharded_poa", "map_all_vs_all_resumable",
           "ring_wavefront_nw", "initialize_distributed", "make_global_mesh",
           "process_count", "process_index", "map_all_vs_all_sharded",
           "merge_sharded_rows", "write_merged_paf"]
