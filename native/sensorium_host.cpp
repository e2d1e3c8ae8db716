// Native host runtime for the sensorium_tpu data pipeline.
//
// The training input pipeline must keep a TPU slice fed from a 148 GB
// corpus of per-trial .npy files.  The reference does this work in Python
// worker processes (full-file np.load per sample —
// /root/reference/src/datasets.py:37-51); here the hot host-side path is
// native code called via ctypes on memory-mapped arrays:
//
//   * gather_rows_f32      — strided time-window gather (responses (N, T))
//   * assemble_stack_input — fused gather + canvas-pad + behavior/pupil
//                            broadcast producing the (5, S, H', W') model
//                            input in one pass (no intermediate copies)
//
// ctypes releases the GIL for the call, so the Python-side loader thread
// pool scales these per-sample entry points across cores (batch-level
// parallelism lives in MiceDataLoader, which also owns mixing/collation).
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// dst[r, s] = src[r, idx[s]] for row-major src (rows, t).
//
// The window indexes span ~128 contiguous bytes of each 1-2 KB row; the
// regular row stride means the hardware prefetcher tracks the access
// pattern on its own (software prefetch was A/B-measured 2-3x SLOWER).
void gather_rows_f32(const float* src, int64_t rows, int64_t t,
                     const int64_t* idx, int64_t s, float* dst) {
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = src + r * t;
    float* out = dst + r * s;
    for (int64_t j = 0; j < s; ++j) {
      out[j] = row[idx[j]];
    }
  }
}

// dst[r, s] = max(src[r, idx[s]], 0) — fused gather + target ReLU
// (reference responses.py:28 clamps targets at zero), writing straight
// into the collated batch row so no intermediate (N, S) sample array or
// collate copy exists.  NaN responses propagate (v != v keeps v), matching
// np.maximum/torch.relu in the NumPy fallback paths bit-for-bit: a NaN
// inside a window must surface as a NaN loss, not silently become a zero
// target only when the native library happens to load.
void gather_rows_relu_f32(const float* src, int64_t rows, int64_t t,
                          const int64_t* idx, int64_t s, float* dst) {
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = src + r * t;
    float* out = dst + r * s;
    for (int64_t j = 0; j < s; ++j) {
      float v = row[idx[j]];
      out[j] = (v > 0.0f || v != v) ? v : 0.0f;
    }
  }
}

// Fused StackInputsProcessor (reference src/inputs.py:15-36) for one
// sample: writes the (5, S, out_h, out_w) float32 input in place.
//   channel 0:   video (vh, vw, t) window frames centered on the canvas
//   channels 1-2: behavior (2, t) broadcast to full planes
//   channels 3-4: pupil center (2, t) broadcast to full planes
void assemble_stack_input(const float* video, int64_t vh, int64_t vw, int64_t vt,
                          const float* behavior, int64_t bt,
                          const float* pupil, int64_t pt,
                          const int64_t* idx, int64_t s,
                          int64_t out_h, int64_t out_w, float fill,
                          float* out) {
  const int64_t plane = out_h * out_w;
  const int64_t chan = s * plane;
  const int64_t h0 = (out_h - vh) / 2;
  const int64_t w0 = (out_w - vw) / 2;

  // Channel 0: fill canvas, then scatter the centered video window.
  float* video_chan = out;
  if (vh == out_h && vw == out_w) {
    // Common no-pad case: gather columns directly, no fill needed.
    for (int64_t j = 0; j < s; ++j) {
      float* frame = video_chan + j * plane;
      const float* base = video + idx[j];
      for (int64_t p = 0; p < plane; ++p) {
        frame[p] = base[p * vt];
      }
    }
  } else {
    std::fill(video_chan, video_chan + chan, fill);
    for (int64_t j = 0; j < s; ++j) {
      float* frame = video_chan + j * plane;
      const float* base = video + idx[j];
      for (int64_t h = 0; h < vh; ++h) {
        float* dst_row = frame + (h0 + h) * out_w + w0;
        const float* src_row = base + h * vw * vt;
        for (int64_t w = 0; w < vw; ++w) {
          dst_row[w] = src_row[w * vt];
        }
      }
    }
  }

  // Channels 1..4: per-frame scalars broadcast over the plane.
  for (int64_t c = 0; c < 2; ++c) {
    const float* src = behavior + c * bt;
    float* chan_ptr = out + (1 + c) * chan;
    for (int64_t j = 0; j < s; ++j) {
      std::fill(chan_ptr + j * plane, chan_ptr + (j + 1) * plane, src[idx[j]]);
    }
  }
  for (int64_t c = 0; c < 2; ++c) {
    const float* src = pupil + c * pt;
    float* chan_ptr = out + (3 + c) * chan;
    for (int64_t j = 0; j < s; ++j) {
      std::fill(chan_ptr + j * plane, chan_ptr + (j + 1) * plane, src[idx[j]]);
    }
  }
}

// One call per training sample: input assembly + fused target gather/ReLU.
// A sample previously cost two ctypes crossings with ~10 pointer
// conversions; the marshalling overhead was comparable to the actual copy
// work, so the whole per-sample fill is one entry point.  ``resp`` may be
// null (unlabeled trials).
void fill_sample(const float* video, int64_t vh, int64_t vw, int64_t vt,
                 const float* behavior, int64_t bt,
                 const float* pupil, int64_t pt,
                 const float* resp, int64_t resp_rows, int64_t resp_t,
                 const int64_t* idx, int64_t s,
                 int64_t out_h, int64_t out_w, float fill,
                 float* input_out, float* target_out) {
  assemble_stack_input(video, vh, vw, vt, behavior, bt, pupil, pt, idx, s,
                       out_h, out_w, fill, input_out);
  if (resp != nullptr && target_out != nullptr) {
    gather_rows_relu_f32(resp, resp_rows, resp_t, idx, s, target_out);
  }
}

}  // extern "C"
