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
//   * assemble_batch       — multithreaded batch assembly over samples
//
// ctypes releases the GIL for the call, so Python-side thread pools scale
// across cores; assemble_batch additionally threads internally so a single
// caller saturates memory bandwidth.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// dst[r, s] = src[r, idx[s]] for row-major src (rows, t).
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

// Batched variant: assemble `n` samples in parallel.  Per-sample pointers
// and window indexes come as arrays; `threads` caps the worker count.
void assemble_batch(const float** videos, const int64_t* vhs, const int64_t* vws,
                    const int64_t* vts,
                    const float** behaviors, const int64_t* bts,
                    const float** pupils, const int64_t* pts,
                    const int64_t* idx, int64_t s,
                    int64_t out_h, int64_t out_w, float fill,
                    float* out, int64_t n, int64_t threads) {
  const int64_t sample_elems = 5 * s * out_h * out_w;
  const int64_t workers =
      std::max<int64_t>(1, std::min<int64_t>(threads, n));

  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int64_t wkr = 0; wkr < workers; ++wkr) {
    pool.emplace_back([&, wkr]() {
      for (int64_t i = wkr; i < n; i += workers) {
        assemble_stack_input(videos[i], vhs[i], vws[i], vts[i],
                             behaviors[i], bts[i], pupils[i], pts[i],
                             idx + i * s, s, out_h, out_w, fill,
                             out + i * sample_elems);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
