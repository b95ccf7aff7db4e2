// F0 (pitch) tracker — C++ host kernel for data-prep / GAN training targets.
//
// Native equivalent of the reference's pyworld extractor (a C++ library;
// reference: cosyvoice/dataset/processor.py compute_f0).  Implements exactly
// the normalized-autocorrelation contract of cosy_tpu/ops/f0.py's numpy
// fallback: per mel-hop frame, mean-removed linear autocorrelation over the
// [sr/fmax, sr/fmin] lag range, first-peak pick with threshold gating and
// parabolic interpolation.  The numpy version computes the same linear
// autocorrelation via rfft/irfft; the direct double-precision sums here are
// mathematically identical up to summation order.
//
// Exposed through the raw CPython API (no pybind11 in this image); frames are
// independent, so the frame loop is parallelized with OpenMP.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// wav: (n,) float32.  out: (n_frames,) float32, pre-zeroed by the caller.
void extract_f0_impl(const float* wav, int64_t n, double sr, int hop,
                     double fmin, double fmax, double threshold, float* out,
                     int64_t n_frames) {
  const int win = static_cast<int>(sr / fmin * 2.0);
  const int pad = win / 2;
  const int lag_min = static_cast<int>(sr / fmax);
  const int lag_max = static_cast<int>(sr / fmin);
  if (win <= 0 || lag_min < 1 || lag_max <= lag_min) return;

  // zero-padded copy (matches np.pad(wav, (pad, pad)))
  std::vector<double> x(static_cast<size_t>(n) + 2 * pad, 0.0);
  for (int64_t i = 0; i < n; ++i) x[pad + i] = static_cast<double>(wav[i]);

#pragma omp parallel
  {
    std::vector<double> f(win);
    std::vector<double> acn(lag_max + 1);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n_frames; ++i) {
      // frame starts at i*hop in the padded signal (= centered on i*hop+pad)
      const size_t start = static_cast<size_t>(i) * hop;
      if (start + win > x.size()) continue;  // cannot happen for valid input
      double mean = 0.0;
      for (int t = 0; t < win; ++t) mean += x[start + t];
      mean /= win;
      for (int t = 0; t < win; ++t) f[t] = x[start + t] - mean;

      double energy = 0.0;
      for (int t = 0; t < win - lag_max; ++t) energy += f[t] * f[t];
      if (energy < 1e-8) continue;

      double ac0 = 0.0;
      for (int t = 0; t < win; ++t) ac0 += f[t] * f[t];
      if (ac0 <= 0.0) continue;

      // linear autocorrelation over [lag_min-1, lag_max] (the -1 feeds the
      // parabolic neighbor), normalized by ac[0]
      const int lo = lag_min - 1;
      for (int l = lo; l <= lag_max; ++l) {
        double s = 0.0;
        const int m = win - l;
        for (int t = 0; t < m; ++t) s += f[t] * f[t + l];
        acn[l] = s / ac0;
      }

      // first maximum over [lag_min, lag_max] (np.argmax tie semantics)
      int k = lag_min;
      double best = acn[lag_min];
      for (int l = lag_min + 1; l <= lag_max; ++l) {
        if (acn[l] > best) {
          best = acn[l];
          k = l;
        }
      }
      if (best < threshold) continue;

      double kf = static_cast<double>(k);
      if (k > 0 && k < lag_max) {
        const double a = acn[k - 1], b = acn[k], c = acn[k + 1];
        const double denom = a - 2.0 * b + c;
        if (std::fabs(denom) > 1e-12) {
          double shift = 0.5 * (a - c) / denom;
          shift = std::max(-1.0, std::min(1.0, shift));
          kf += shift;
        }
      }
      out[i] = static_cast<float>(sr / kf);
    }
  }
}

// args: wav (float32 readonly buffer), out (float32 writable buffer),
//       sr, hop (ints), fmin, fmax, threshold (doubles)
PyObject* extract_f0(PyObject*, PyObject* args) {
  Py_buffer wav_buf, out_buf;
  int sr, hop;
  double fmin, fmax, threshold;
  if (!PyArg_ParseTuple(args, "y*w*iiddd", &wav_buf, &out_buf, &sr, &hop,
                        &fmin, &fmax, &threshold)) {
    return nullptr;
  }
  const auto* wav = static_cast<const float*>(wav_buf.buf);
  auto* out = static_cast<float*>(out_buf.buf);
  const int64_t n = wav_buf.len / static_cast<int64_t>(sizeof(float));
  const int64_t n_frames = out_buf.len / static_cast<int64_t>(sizeof(float));

  Py_BEGIN_ALLOW_THREADS
  extract_f0_impl(wav, n, static_cast<double>(sr), hop, fmin, fmax, threshold,
                  out, n_frames);
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&wav_buf);
  PyBuffer_Release(&out_buf);
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"extract_f0", extract_f0, METH_VARARGS,
     "Normalized-autocorrelation pitch tracking into a pre-zeroed buffer."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_f0", "F0 native kernel", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__f0(void) { return PyModule_Create(&kModule); }
