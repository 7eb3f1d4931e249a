from toyslam_tpu.io.codec import bytes_to_graph, graph_to_bytes
from toyslam_tpu.io.snapshot import load_snapshot, save_snapshot

__all__ = [
    "graph_to_bytes",
    "bytes_to_graph",
    "save_snapshot",
    "load_snapshot",
]
