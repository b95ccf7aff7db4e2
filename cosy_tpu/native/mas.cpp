// Monotonic Alignment Search (MAS) — C++ host kernel.
//
// TPU-native replacement for the reference's only native code, the Cython
// maximum_path kernel (reference: matcha/utils/monotonic_align/core.pyx —
// O(T_x * T_y) Viterbi-style DP used by Matcha-TTS training).  Implemented
// against the public MAS recurrence (Glow-TTS/VITS):
//
//   V[x, y] = logp[x, y] + max(V[x, y-1], V[x-1, y-1])
//   path    = backtrack of argmax decisions from (t_x-1, t_y-1)
//
// Exposed through the raw CPython API (no pybind11 in this image); the batch
// loop is parallelized with OpenMP when available.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr float kNegInf = -1e9f;

// value: (t_x, t_y) row-major, modified in place; path: (t_x, t_y) int32 out.
void maximum_path_single(float* value, int32_t* path, int t_x, int t_y) {
  for (int y = 0; y < t_y; ++y) {
    const int x_lo = std::max(0, t_x + y - t_y);
    const int x_hi = std::min(t_x - 1, y);
    for (int x = x_lo; x <= x_hi; ++x) {
      float v_cur = (x == y) ? kNegInf : value[x * t_y + (y - 1)];
      float v_prev;
      if (x == 0) {
        v_prev = (y == 0) ? 0.0f : kNegInf;
      } else {
        v_prev = (y == 0) ? kNegInf : value[(x - 1) * t_y + (y - 1)];
      }
      value[x * t_y + y] += std::max(v_cur, v_prev);
    }
  }
  int index = t_x - 1;
  for (int y = t_y - 1; y >= 0; --y) {
    path[index * t_y + y] = 1;
    if (index != 0 &&
        (index == y ||
         value[index * t_y + (y - 1)] < value[(index - 1) * t_y + (y - 1)])) {
      --index;
    }
  }
}

// args: value buffer (float32, B*Tx*Ty, modified in place),
//       path buffer (int32, B*Tx*Ty, pre-zeroed),
//       t_xs (int32, B), t_ys (int32, B), B, Tx, Ty
PyObject* maximum_path(PyObject*, PyObject* args) {
  Py_buffer value_buf, path_buf, txs_buf, tys_buf;
  int B, Tx, Ty;
  if (!PyArg_ParseTuple(args, "w*w*y*y*iii", &value_buf, &path_buf, &txs_buf,
                        &tys_buf, &B, &Tx, &Ty)) {
    return nullptr;
  }
  auto* value = static_cast<float*>(value_buf.buf);
  auto* path = static_cast<int32_t*>(path_buf.buf);
  const auto* t_xs = static_cast<const int32_t*>(txs_buf.buf);
  const auto* t_ys = static_cast<const int32_t*>(tys_buf.buf);

  Py_BEGIN_ALLOW_THREADS
#pragma omp parallel for schedule(dynamic)
  for (int b = 0; b < B; ++b) {
    const int tx = t_xs[b];
    const int ty = t_ys[b];
    if (tx <= 0 || ty <= 0) continue;
    // per-sample views are (tx, ty) slices of the padded (Tx, Ty) grid; copy
    // into a compact buffer so the DP indexing stays simple.
    std::vector<float> v(static_cast<size_t>(tx) * ty);
    std::vector<int32_t> p(static_cast<size_t>(tx) * ty, 0);
    for (int x = 0; x < tx; ++x) {
      std::copy_n(value + (static_cast<size_t>(b) * Tx + x) * Ty, ty,
                  v.data() + static_cast<size_t>(x) * ty);
    }
    maximum_path_single(v.data(), p.data(), tx, ty);
    for (int x = 0; x < tx; ++x) {
      std::copy_n(p.data() + static_cast<size_t>(x) * ty, ty,
                  path + (static_cast<size_t>(b) * Tx + x) * Ty);
      std::copy_n(v.data() + static_cast<size_t>(x) * ty, ty,
                  value + (static_cast<size_t>(b) * Tx + x) * Ty);
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&value_buf);
  PyBuffer_Release(&path_buf);
  PyBuffer_Release(&txs_buf);
  PyBuffer_Release(&tys_buf);
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"maximum_path", maximum_path, METH_VARARGS,
     "In-place batched monotonic alignment search DP."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_mas", "MAS native kernel", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__mas(void) { return PyModule_Create(&kModule); }
