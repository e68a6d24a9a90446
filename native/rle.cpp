// COCO RLE mask ops — C++ core (pycocotools `_mask` parity; SURVEY.md §2.3).
//
// The reference depended on pycocotools' C extension for RLE encode/decode,
// area and IoU; that dependency doesn't exist in this environment, so the
// published format is implemented natively here. IoU works directly on runs
// (two-pointer merge) without decoding — O(runs) instead of O(pixels), the
// property that makes bulk segm eval cheap.
//
// Layout: column-major (Fortran) runs, alternating zero-run/one-run, starting
// with the zero count — the COCO uncompressed "counts" convention.
//
// Built as a shared library; see mxdetection_tpu/eval/rle_native.py (ctypes).

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// mask (h*w, column-major flattened) -> counts; returns number of runs
// written, or -1 if max_counts too small.
int rle_encode(const uint8_t* mask, int h, int w, int* counts, int max_counts) {
  const long n = (long)h * w;
  int nc = 0;
  uint8_t cur = 0;  // runs start with zeros
  long run = 0;
  for (long i = 0; i < n; ++i) {
    uint8_t v = mask[i] ? 1 : 0;
    if (v != cur) {
      if (nc >= max_counts) return -1;
      counts[nc++] = (int)run;
      run = 0;
      cur = v;
    }
    ++run;
  }
  if (nc >= max_counts) return -1;
  counts[nc++] = (int)run;
  return nc;
}

void rle_decode(const int* counts, int n, int h, int w, uint8_t* out) {
  long pos = 0;
  uint8_t val = 0;
  const long total = (long)h * w;
  for (int i = 0; i < n; ++i) {
    long c = counts[i];
    if (c > total - pos) c = total - pos;
    if (val) memset(out + pos, 1, (size_t)c);
    else memset(out + pos, 0, (size_t)c);
    pos += c;
    val ^= 1;
  }
  if (pos < total) memset(out + pos, 0, (size_t)(total - pos));
}

long rle_area(const int* counts, int n) {
  long a = 0;
  for (int i = 1; i < n; i += 2) a += counts[i];
  return a;
}

// Intersection of two RLEs by run merging (no decode).
static long rle_intersection(const int* a, int na, const int* b, int nb) {
  long inter = 0;
  int ia = 0, ib = 0;
  long ca = na > 0 ? a[0] : 0, cb = nb > 0 ? b[0] : 0;
  int va = 0, vb = 0;
  while (ia < na && ib < nb) {
    long t = std::min(ca, cb);
    if (va && vb) inter += t;
    ca -= t;
    cb -= t;
    if (ca == 0) {
      if (++ia < na) ca = a[ia];
      va ^= 1;
    }
    if (cb == 0) {
      if (++ib < nb) cb = b[ib];
      vb ^= 1;
    }
  }
  return inter;
}

// IoU (or IoF against dt when iscrowd) between two RLEs.
double rle_iou(const int* dt, int ndt, const int* gt, int ngt, int iscrowd) {
  const long inter = rle_intersection(dt, ndt, gt, ngt);
  const long da = rle_area(dt, ndt);
  if (iscrowd) return da > 0 ? (double)inter / (double)da : 0.0;
  const long ua = da + rle_area(gt, ngt) - inter;
  return ua > 0 ? (double)inter / (double)ua : 0.0;
}

// Batched IoU matrix: dts/gts as concatenated runs with offsets.
void rle_iou_matrix(const int* dt_runs, const int* dt_off, int ndt,
                    const int* gt_runs, const int* gt_off, int ngt,
                    const uint8_t* gt_crowd, double* out) {
  for (int i = 0; i < ndt; ++i) {
    const int* d = dt_runs + dt_off[i];
    const int nd = dt_off[i + 1] - dt_off[i];
    for (int j = 0; j < ngt; ++j) {
      const int* g = gt_runs + gt_off[j];
      const int ng = gt_off[j + 1] - gt_off[j];
      out[(long)i * ngt + j] = rle_iou(d, nd, g, ng, gt_crowd[j]);
    }
  }
}

}  // extern "C"
