// Native BVH builder: the host-side counterpart of the reference's C++
// accel layer (embree wrapper / kdtree.h SAH builder).  Builds the same
// threaded (hit/miss link) layout consumed by beifong_tpu/geometry/bvh.py,
// ~50x faster than the Python recursion for 100k+ triangle meshes.
//
// C ABI for ctypes; no dependencies beyond the C++17 standard library.
//
// Build: make (see Makefile) -> libbeifong_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BuildNode {
    float bbmin[3], bbmax[3];
    int left = -1, right = -1;
    int start = -1, count = 0;
};

struct Ctx {
    const float *lo, *hi, *centroid;
    int leaf_size;
    std::vector<BuildNode> nodes;
    std::vector<int> order;
    std::vector<int> scratch;  // triangle index workspace
};

int build_rec(Ctx &c, int *idx, int n) {
    int ni = (int)c.nodes.size();
    c.nodes.emplace_back();
    BuildNode &node = c.nodes.back();
    for (int k = 0; k < 3; ++k) {
        node.bbmin[k] = 1e30f;
        node.bbmax[k] = -1e30f;
    }
    for (int i = 0; i < n; ++i) {
        const float *l = c.lo + 3 * idx[i];
        const float *h = c.hi + 3 * idx[i];
        for (int k = 0; k < 3; ++k) {
            node.bbmin[k] = std::min(node.bbmin[k], l[k]);
            node.bbmax[k] = std::max(node.bbmax[k], h[k]);
        }
    }
    if (n <= c.leaf_size) {
        c.nodes[ni].start = (int)c.order.size();
        c.nodes[ni].count = n;
        c.order.insert(c.order.end(), idx, idx + n);
        return ni;
    }
    int axis = 0;
    float ext = node.bbmax[0] - node.bbmin[0];
    for (int k = 1; k < 3; ++k) {
        float e = node.bbmax[k] - node.bbmin[k];
        if (e > ext) { ext = e; axis = k; }
    }
    const float *cen = c.centroid;
    int mid = n / 2;
    std::nth_element(idx, idx + mid, idx + n, [cen, axis](int a, int b) {
        return cen[3 * a + axis] < cen[3 * b + axis];
    });
    int l = build_rec(c, idx, mid);
    int r = build_rec(c, idx + mid, n - mid);
    c.nodes[ni].left = l;
    c.nodes[ni].right = r;
    return ni;
}

void thread_links(const std::vector<BuildNode> &nodes, int ni, int escape,
                  int *hit_link, int *miss_link, int *leaf_off, int *leaf_cnt) {
    // iterative to avoid deep recursion on degenerate trees
    struct Item { int ni, escape; };
    std::vector<Item> stack{{ni, escape}};
    while (!stack.empty()) {
        Item it = stack.back();
        stack.pop_back();
        const BuildNode &n = nodes[it.ni];
        miss_link[it.ni] = it.escape;
        if (n.left < 0) {
            leaf_off[it.ni] = n.start;
            leaf_cnt[it.ni] = n.count;
            hit_link[it.ni] = it.escape;
        } else {
            hit_link[it.ni] = n.left;
            leaf_off[it.ni] = -1;
            leaf_cnt[it.ni] = 0;
            stack.push_back({n.right, it.escape});
            stack.push_back({n.left, n.right});
        }
    }
}

}  // namespace

extern "C" {

// Returns the node count (<= 2 * ceil(n_tris / 1) ... caller must allocate
// outputs of size 2*n_tris nodes and n_tris order entries).
int beifong_build_bvh(const float *v0, const float *e1, const float *e2,
                      int n_tris, int leaf_size,
                      float *bb_min, float *bb_max,
                      int *hit_link, int *miss_link,
                      int *leaf_offset, int *leaf_count, int *order) {
    std::vector<float> lo(3 * n_tris), hi(3 * n_tris), cen(3 * n_tris);
    for (int i = 0; i < n_tris; ++i) {
        for (int k = 0; k < 3; ++k) {
            float a = v0[3 * i + k];
            float b = a + e1[3 * i + k];
            float c2 = a + e2[3 * i + k];
            float l = std::min(a, std::min(b, c2));
            float h = std::max(a, std::max(b, c2));
            lo[3 * i + k] = l;
            hi[3 * i + k] = h;
            cen[3 * i + k] = 0.5f * (l + h);
        }
    }
    Ctx c;
    c.lo = lo.data();
    c.hi = hi.data();
    c.centroid = cen.data();
    c.leaf_size = leaf_size;
    c.nodes.reserve(2 * (size_t)n_tris / std::max(leaf_size / 2, 1) + 4);
    c.order.reserve(n_tris);
    std::vector<int> idx(n_tris);
    for (int i = 0; i < n_tris; ++i) idx[i] = i;
    build_rec(c, idx.data(), n_tris);

    int n_nodes = (int)c.nodes.size();
    for (int i = 0; i < n_nodes; ++i) {
        std::memcpy(bb_min + 3 * i, c.nodes[i].bbmin, 12);
        std::memcpy(bb_max + 3 * i, c.nodes[i].bbmax, 12);
    }
    thread_links(c.nodes, 0, -1, hit_link, miss_link, leaf_offset, leaf_count);
    std::memcpy(order, c.order.data(), sizeof(int) * n_tris);
    return n_nodes;
}

// Fast OBJ position/face parser.  Two-phase: pass null outputs to get
// counts, then call again with allocated buffers.
int beifong_parse_obj_counts(const char *path, int *n_verts, int *n_faces);
int beifong_parse_obj(const char *path, float *verts, int *faces);

}  // extern "C"

#include <cstdio>

extern "C" int beifong_parse_obj_counts(const char *path, int *n_verts,
                                        int *n_faces) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    char line[4096];
    int nv = 0, nf = 0;
    while (std::fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && line[1] == ' ') nv++;
        else if (line[0] == 'f' && line[1] == ' ') {
            // count triangles after fan triangulation
            int verts_in_face = 0;
            char *p = line + 2;
            while (*p) {
                while (*p == ' ' || *p == '\t') p++;
                if (*p == 0 || *p == '\n' || *p == '\r') break;
                verts_in_face++;
                while (*p && *p != ' ' && *p != '\t' && *p != '\n') p++;
            }
            if (verts_in_face >= 3) nf += verts_in_face - 2;
        }
    }
    std::fclose(f);
    *n_verts = nv;
    *n_faces = nf;
    return 0;
}

extern "C" int beifong_parse_obj(const char *path, float *verts, int *faces) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    char line[4096];
    int nv = 0, nf = 0;
    std::vector<int> poly;
    while (std::fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (std::sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                verts[3 * nv] = x;
                verts[3 * nv + 1] = y;
                verts[3 * nv + 2] = z;
                nv++;
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            poly.clear();
            char *p = line + 2;
            while (*p) {
                while (*p == ' ' || *p == '\t') p++;
                if (*p == 0 || *p == '\n' || *p == '\r') break;
                long k = std::strtol(p, &p, 10);
                poly.push_back(k > 0 ? (int)k - 1 : nv + (int)k);
                while (*p && *p != ' ' && *p != '\t' && *p != '\n') p++;
            }
            for (size_t j = 1; j + 1 < poly.size(); ++j) {
                faces[3 * nf] = poly[0];
                faces[3 * nf + 1] = poly[j];
                faces[3 * nf + 2] = poly[j + 1];
                nf++;
            }
        }
    }
    std::fclose(f);
    return nf;
}
