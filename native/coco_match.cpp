// COCO greedy detection-gt matching — C++ core for bulk evaluation.
//
// Reference equivalent: the matching inner loop of pycocotools' COCOeval
// (evaluateImg). Pure python matching costs ~20s for a full COCO val sweep
// (5k images x 80 categories x 10 IoU thresholds); this native version is
// the production path, with the python implementation in eval/coco_eval.py
// kept as the tested reference.
//
// Protocol (published COCO eval algorithm): detections in descending score
// order greedily match the best remaining gt with IoU >= threshold; crowd
// gts may absorb multiple detections; once a detection has a non-ignored
// candidate it never switches to an ignored gt.

#include <cstdint>

extern "C" {

// ious: (D, G) row-major; gt_ignore/gt_crowd: (G,); thrs: (T,)
// out_match: (T, D) gt index or -1; out_ignore: (T, D) 0/1
// scratch gtm: caller-provided (G,) int64 workspace.
void coco_match(const double* ious, int d, int g,
                const uint8_t* gt_ignore, const uint8_t* gt_crowd,
                const double* thrs, int t,
                int64_t* out_match, uint8_t* out_ignore,
                int64_t* gtm) {
  for (int ti = 0; ti < t; ++ti) {
    const double thr = thrs[ti];
    for (int gi = 0; gi < g; ++gi) gtm[gi] = -1;
    for (int di = 0; di < d; ++di) {
      int best = -1;
      double best_iou = thr < (1.0 - 1e-10) ? thr : (1.0 - 1e-10);
      const double* row = ious + (int64_t)di * g;
      for (int gi = 0; gi < g; ++gi) {
        if (gtm[gi] >= 0 && !gt_crowd[gi]) continue;
        if (best > -1 && !gt_ignore[best] && gt_ignore[gi]) break;
        if (row[gi] < best_iou) continue;
        best_iou = row[gi];
        best = gi;
      }
      const int64_t idx = (int64_t)ti * d + di;
      if (best >= 0) {
        out_match[idx] = best;
        gtm[best] = di;
        out_ignore[idx] = gt_ignore[best];
      } else {
        out_match[idx] = -1;
        out_ignore[idx] = 0;
      }
    }
  }
}

}  // extern "C"
