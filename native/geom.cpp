// Host-side exact OBB geometry kernels (C++, double precision).
//
// Native replacement for the GEOS/shapely polygon ops the reference leans
// on for merging, fusion and metrics (Detect_OBB.py:144-200). The device
// path uses the JAX kernels in ops/geometry.py; this library serves the
// host-side sequential algorithms (greedy merge, consensus fusion, greedy
// GT matching) where a ctypes call on a few hundred boxes beats a device
// round-trip + compile.
//
// Algorithms mirror ops/geometry.py exactly: triangle-decomposed
// Sutherland-Hodgman intersection (exact for all simple quads),
// self-intersecting quads -> IoU 0.
//
// Build: make -C native   (produces libgeomobb.so; loaded via ctypes)

#include <algorithm>
#include <cmath>
#include <cstring>

namespace {

struct Pt {
    double x, y;
};

inline double cross(const Pt& o, const Pt& a, const Pt& b) {
    return (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x);
}

// Shoelace area (absolute) of an n-gon.
double poly_area(const Pt* p, int n) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) {
        const Pt& a = p[i];
        const Pt& b = p[(i + 1) % n];
        s += a.x * b.y - b.x * a.y;
    }
    return std::fabs(s) * 0.5;
}

// Clip polygon (pts, n) by half-plane left-of a->b into out; returns count.
int clip_halfplane(const Pt* pts, int n, Pt a, Pt b, Pt* out) {
    int m = 0;
    double abx = b.x - a.x, aby = b.y - a.y;
    for (int i = 0; i < n; ++i) {
        const Pt& s = pts[i];
        const Pt& e = pts[(i + 1) % n];
        double ds = abx * (s.y - a.y) - aby * (s.x - a.x);
        double de = abx * (e.y - a.y) - aby * (e.x - a.x);
        bool in_s = ds >= 0.0, in_e = de >= 0.0;
        if (in_s != in_e) {
            double denom = ds - de;
            double t = (std::fabs(denom) < 1e-300) ? 0.0 : ds / denom;
            t = std::min(1.0, std::max(0.0, t));
            out[m].x = s.x + t * (e.x - s.x);
            out[m].y = s.y + t * (e.y - s.y);
            ++m;
        }
        if (in_e) out[m++] = e;
    }
    return m;
}

// Intersection area of two triangles (any orientation).
double tri_tri_area(Pt t1[3], Pt t2[3]) {
    Pt a[16], b[16];
    // force CCW
    if (cross(t1[0], t1[1], t1[2]) < 0) std::swap(t1[0], t1[2]);
    if (cross(t2[0], t2[1], t2[2]) < 0) std::swap(t2[0], t2[2]);
    std::memcpy(a, t1, 3 * sizeof(Pt));
    int n = 3;
    Pt* cur = a;
    Pt* nxt = b;
    for (int k = 0; k < 3; ++k) {
        n = clip_halfplane(cur, n, t2[k], t2[(k + 1) % 3], nxt);
        std::swap(cur, nxt);
        if (n == 0) return 0.0;
    }
    return poly_area(cur, n);
}

// Split a simple quad into two triangles along an internal diagonal.
void quad_triangles(const Pt q[4], Pt tri[2][3]) {
    double a1 = cross(q[0], q[1], q[2]);
    double a2 = cross(q[0], q[2], q[3]);
    if (a1 * a2 >= 0.0) {
        tri[0][0] = q[0]; tri[0][1] = q[1]; tri[0][2] = q[2];
        tri[1][0] = q[0]; tri[1][1] = q[2]; tri[1][2] = q[3];
    } else {
        tri[0][0] = q[1]; tri[0][1] = q[2]; tri[0][2] = q[3];
        tri[1][0] = q[1]; tri[1][1] = q[3]; tri[1][2] = q[0];
    }
}

bool segments_properly_intersect(const Pt& p1, const Pt& p2, const Pt& p3,
                                 const Pt& p4) {
    double d1 = cross(p3, p4, p1);
    double d2 = cross(p3, p4, p2);
    double d3 = cross(p1, p2, p3);
    double d4 = cross(p1, p2, p4);
    return (d1 * d2 < 0) && (d3 * d4 < 0);
}

bool quad_is_simple(const Pt q[4]) {
    return !(segments_properly_intersect(q[0], q[1], q[2], q[3]) ||
             segments_properly_intersect(q[1], q[2], q[3], q[0]));
}

void load_quad(const double* c8, Pt q[4]) {
    for (int i = 0; i < 4; ++i) {
        q[i].x = c8[2 * i];
        q[i].y = c8[2 * i + 1];
    }
}

struct AABB {
    double x0, y0, x1, y1;
};

AABB quad_aabb(const Pt q[4]) {
    AABB b{q[0].x, q[0].y, q[0].x, q[0].y};
    for (int i = 1; i < 4; ++i) {
        b.x0 = std::min(b.x0, q[i].x);
        b.y0 = std::min(b.y0, q[i].y);
        b.x1 = std::max(b.x1, q[i].x);
        b.y1 = std::max(b.y1, q[i].y);
    }
    return b;
}

// Disjoint AABBs => intersection area 0 => IoU 0: an exact prescreen for
// any positive IoU threshold. Most det pairs on a large map are spatially
// disjoint, so this skips the quad clipping for ~all of them.
inline bool aabb_overlap(const AABB& a, const AABB& b) {
    return a.x0 <= b.x1 && b.x0 <= a.x1 && a.y0 <= b.y1 && b.y0 <= a.y1;
}

double quad_iou_impl(const Pt q1[4], const Pt q2[4]) {
    if (!quad_is_simple(q1) || !quad_is_simple(q2)) return 0.0;
    Pt t1[2][3], t2[2][3];
    quad_triangles(q1, t1);
    quad_triangles(q2, t2);
    double inter = 0.0;
    Pt ta[3], tb[3];
    for (int i = 0; i < 2; ++i)
        for (int j = 0; j < 2; ++j) {
            std::memcpy(ta, t1[i], sizeof(ta));
            std::memcpy(tb, t2[j], sizeof(tb));
            inter += tri_tri_area(ta, tb);
        }
    double u = poly_area(q1, 4) + poly_area(q2, 4) - inter;
    return u > 0.0 ? inter / u : 0.0;
}

}  // namespace

extern "C" {

double quad_iou(const double* c8a, const double* c8b) {
    Pt q1[4], q2[4];
    load_quad(c8a, q1);
    load_quad(c8b, q2);
    return quad_iou_impl(q1, q2);
}

// A [n,8], B [m,8] -> out [n*m] row-major.
void quad_iou_matrix(const double* A, int n, const double* B, int m,
                     double* out) {
    for (int i = 0; i < n; ++i) {
        Pt q1[4];
        load_quad(A + 8 * i, q1);
        for (int j = 0; j < m; ++j) {
            Pt q2[4];
            load_quad(B + 8 * j, q2);
            out[i * m + j] = quad_iou_impl(q1, q2);
        }
    }
}

// Greedy class-aware NMS over dets [n,11] (x1..y4, cls, conf, angle).
// Writes kept det indices (conf-descending) to keep_out; returns count.
int greedy_nms(const double* dets, int n, double iou_thr, int* keep_out) {
    // stable conf-descending order
    int* order = new int[n];
    for (int i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order, order + n, [&](int a, int b) {
        return dets[a * 11 + 9] > dets[b * 11 + 9];
    });
    Pt(*quads)[4] = new Pt[n][4];
    AABB* boxes = new AABB[n];
    for (int i = 0; i < n; ++i) {
        load_quad(dets + 11 * i, quads[i]);
        boxes[i] = quad_aabb(quads[i]);
    }
    // AABB prescreen is exact only for a positive threshold (disjoint
    // boxes have IoU 0 < thr); thr <= 0 disables it
    bool prescreen = iou_thr > 0.0;
    int kept = 0;
    for (int oi = 0; oi < n; ++oi) {
        int i = order[oi];
        bool ok = true;
        for (int kj = 0; kj < kept; ++kj) {
            int j = keep_out[kj];
            if (dets[i * 11 + 8] != dets[j * 11 + 8]) continue;
            if (prescreen && !aabb_overlap(boxes[i], boxes[j])) continue;
            if (quad_iou_impl(quads[i], quads[j]) >= iou_thr) {
                ok = false;
                break;
            }
        }
        if (ok) keep_out[kept++] = i;
    }
    delete[] quads;
    delete[] boxes;
    delete[] order;
    return kept;
}

// Cross-scale consensus late fusion, mirroring Detect_OBB.py:347-423
// bit-for-bit (same scan order, same (conf, then IoU) partner
// tie-breaking, same visited bookkeeping). `dets` [n,11] is the
// CONS_LOW-prefiltered concatenation of every scale's detections in
// ascending-scale block order; scale_of[i] is the row's scale index.
// Writes kept row indices in discovery order; returns count.
int consensus_filter(const double* dets, const int* scale_of, int n,
                     double iou_partner, double cons_low, double cons_high,
                     int* keep_out) {
    Pt(*quads)[4] = new Pt[n][4];
    AABB* boxes = new AABB[n];
    bool* visited = new bool[n]();
    for (int i = 0; i < n; ++i) {
        load_quad(dets + 11 * i, quads[i]);
        boxes[i] = quad_aabb(quads[i]);
    }
    bool prescreen = iou_partner > 0.0;
    int kept = 0;
    for (int i = 0; i < n; ++i) {
        if (visited[i]) continue;
        double cls = dets[i * 11 + 8];
        double conf = dets[i * 11 + 9];
        int best = -1;
        double best_conf = -1.0, best_iou = 0.0;
        // ascending k over the scale-ordered blocks == the reference's
        // "for t in other scales (sorted): for j in pool" scan order
        for (int k = 0; k < n; ++k) {
            if (scale_of[k] == scale_of[i] || visited[k]) continue;
            if (dets[k * 11 + 8] != cls) continue;
            if (prescreen && !aabb_overlap(boxes[i], boxes[k])) continue;
            double iou = quad_iou_impl(quads[i], quads[k]);
            if (iou >= iou_partner) {
                double cp = dets[k * 11 + 9];
                if (cp > best_conf ||
                    (cp == best_conf && iou > best_iou)) {
                    best = k;
                    best_conf = cp;
                    best_iou = iou;
                }
            }
        }
        if (best < 0 || best_conf < cons_low) {
            if (conf >= cons_high) keep_out[kept++] = i;
            visited[i] = true;
            continue;
        }
        keep_out[kept++] = (conf >= best_conf) ? i : best;
        visited[i] = true;
        visited[best] = true;
    }
    delete[] quads;
    delete[] boxes;
    delete[] visited;
    return kept;
}

// Grouped greedy NMS: dets [n,11] with group_ids [n] in CONTIGUOUS runs
// (caller sorts by group id; conf-descending within a group is preserved
// because the per-group sort is stable). Runs greedy_nms independently
// per run and writes kept GLOBAL indices, group order then conf-desc
// within group. Returns total kept. One ctypes call replaces a Python
// loop over thousands of per-tile merges (infer/pipeline.py).
int greedy_nms_grouped(const double* dets, const int* group_ids, int n,
                       double iou_thr, int* keep_out) {
    int total = 0;
    int start = 0;
    while (start < n) {
        int end = start + 1;
        while (end < n && group_ids[end] == group_ids[start]) ++end;
        int kept = greedy_nms(dets + 11 * start, end - start, iou_thr,
                              keep_out + total);
        for (int k = 0; k < kept; ++k) keep_out[total + k] += start;
        total += kept;
        start = end;
    }
    return total;
}

// Greedy per-threshold det->GT matching for the AP sweeps
// (Detect_OBB.py:512-565 semantics at every threshold at once).
// iou: [nd, ng] row-major with det rows in confidence-descending order;
// thrs: [T]. Each threshold evolves an independent matched-GT mask; det
// d is a TP at threshold t iff its best UNMATCHED gt by IoU has iou > 0
// and iou >= thrs[t] (ties pick the first gt, like numpy argmax), and
// that gt becomes matched. out_tp: [T, nd] row-major, 0/1.
void pr_match_multi(const double* iou, int nd, int ng, const double* thrs,
                    int T, unsigned char* out_tp) {
    bool* matched = new bool[(size_t)T * ng]();
    std::memset(out_tp, 0, (size_t)T * nd);
    for (int d = 0; d < nd; ++d) {
        const double* row = iou + (size_t)d * ng;
        for (int t = 0; t < T; ++t) {
            bool* m = matched + (size_t)t * ng;
            double best = 0.0;
            int bj = -1;
            for (int j = 0; j < ng; ++j) {
                if (!m[j] && row[j] > best) {
                    best = row[j];
                    bj = j;
                }
            }
            if (bj >= 0 && best >= thrs[t]) {
                m[bj] = true;
                out_tp[(size_t)t * nd + d] = 1;
            }
        }
    }
    delete[] matched;
}

}  // extern "C"
