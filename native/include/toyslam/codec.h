// Native wire codec: length-framed little-endian float32 graph stream.
//
// Byte-compatible with both the reference protocol (reference
// python/remote/graph_to_bytes.py:32-67, remote/serialization/
// SerializeGraph.h:9-72, DeserializeGraph.h:10-174) and the Python codec in
// toyslam_tpu/io/codec.py (cross-checked byte-for-byte in
// tests/test_native.py).
#pragma once

#include <cstdint>
#include <vector>

#include "toyslam/graph.h"

namespace toyslam {

// Decode a graph body (no 4-byte frame header). Returns nullptr on a
// malformed stream.
TsGraph* decode_graph(const uint8_t* data, uint64_t len);

// Encode to the wire body; appends to `out`.
void encode_graph(const TsGraph& g, std::vector<uint8_t>& out);

}  // namespace toyslam
