// tpu_ann native host runtime — C++ counterparts of the host-side hot
// paths that stay off the TPU: dataset file IO (the role of the fork's
// fbin/fvecs readers, tutorial/cpp/0-IVFHNSW.cpp:34-59, and
// contrib/vecs_io.py) and invlist packing (the counting-sort layout build,
// the batch analog of InvertedLists::add_entries).
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image). Threading: std::thread pool sized by hardware_concurrency —
// replaces the reference's OpenMP pragmas.
//
// Build: make -C native   (produces libtpu_ann_native.so)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

// ---------------------------------------------------------------------------
// parallel helpers (replaces the reference's OpenMP pragmas)
// ---------------------------------------------------------------------------

static void parallel_for(int64_t n, int64_t grain,
                         const std::function<void(int64_t, int64_t)>& fn) {
    unsigned nt = std::thread::hardware_concurrency();
    if (nt == 0) nt = 4;
    int64_t nchunk = (n + grain - 1) / grain;
    if (nchunk <= 1) {
        fn(0, n);
        return;
    }
    std::atomic<int64_t> next(0);
    std::vector<std::thread> threads;
    unsigned use = std::min<unsigned>(nt, (unsigned)nchunk);
    for (unsigned t = 0; t < use; t++) {
        threads.emplace_back([&]() {
            for (;;) {
                int64_t c = next.fetch_add(1);
                if (c >= nchunk) break;
                int64_t lo = c * grain;
                int64_t hi = std::min(n, lo + grain);
                fn(lo, hi);
            }
        });
    }
    for (auto& th : threads) th.join();
}

extern "C" {

// ---------------------------------------------------------------------------
// dataset IO: fbin ([n:i32][d:i32][f32 data]) and fvecs ([d:i32][f32*d])*
// ---------------------------------------------------------------------------

// Returns 0 on success. Reads header only.
int fbin_header(const char* path, int32_t* n, int32_t* d) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    int32_t hdr[2];
    if (fread(hdr, 4, 2, f) != 2) { fclose(f); return -2; }
    *n = hdr[0];
    *d = hdr[1];
    fclose(f);
    return 0;
}

// Read rows [start, start+count) into out (caller-allocated, count*d f32).
int fbin_read(const char* path, int64_t start, int64_t count, float* out) {
    int32_t n, d;
    if (fbin_header(path, &n, &d) != 0) return -1;
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    if (fseeko(f, 8 + start * (int64_t)d * 4, SEEK_SET) != 0) {
        fclose(f);
        return -3;
    }
    size_t want = (size_t)count * d;
    size_t got = fread(out, 4, want, f);
    fclose(f);
    return got == want ? 0 : -4;
}

// fvecs: per-row [d:i32][f32*d]. Returns rows read or <0 on error.
int64_t fvecs_read(const char* path, int64_t max_rows, int32_t* d_out,
                   float* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    int32_t d;
    if (fread(&d, 4, 1, f) != 1) { fclose(f); return -2; }
    fseeko(f, 0, SEEK_END);
    int64_t fsize = ftello(f);
    int64_t rowbytes = 4 + (int64_t)d * 4;
    int64_t rows = fsize / rowbytes;
    if (max_rows >= 0 && rows > max_rows) rows = max_rows;
    *d_out = d;
    if (!out) { fclose(f); return rows; }
    fseeko(f, 0, SEEK_SET);
    // parallel chunked read via pread-style reopening
    fclose(f);
    parallel_for(rows, 65536, [&](int64_t lo, int64_t hi) {
        FILE* ff = fopen(path, "rb");
        if (!ff) return;
        std::vector<char> buf((hi - lo) * rowbytes);
        fseeko(ff, lo * rowbytes, SEEK_SET);
        if (fread(buf.data(), 1, buf.size(), ff) == (size_t)buf.size()) {
            for (int64_t r = lo; r < hi; r++) {
                const char* src = buf.data() + (r - lo) * rowbytes + 4;
                memcpy(out + r * d, src, (size_t)d * 4);
            }
        }
        fclose(ff);
    });
    return rows;
}

// ---------------------------------------------------------------------------
// invlist packing: counting sort of n rows into block-padded layout
// ---------------------------------------------------------------------------

// Computes, from an assignment, the block layout metadata.
//   sizes (nlist), nblocks_per_list (nlist), starts_blocks (nlist)
// Returns total data blocks (excluding the dummy block).
int64_t pack_layout(const int64_t* assign, int64_t n, int64_t nlist,
                    int64_t block, int64_t* sizes, int64_t* nblocks_per_list,
                    int64_t* starts_blocks) {
    memset(sizes, 0, nlist * 8);
    for (int64_t i = 0; i < n; i++) sizes[assign[i]]++;
    int64_t acc = 0;
    for (int64_t l = 0; l < nlist; l++) {
        nblocks_per_list[l] = (sizes[l] + block - 1) / block;
        starts_blocks[l] = acc;
        acc += nblocks_per_list[l];
    }
    return acc;
}

// Scatter rows into the packed layout. data_out must be zero-initialised
// ((nb_total+1)*block rows of row_bytes); ids_out filled with -1
// ((nb_total+1)*block int32). Empty lists must be pointed at the dummy
// block by the caller (python side fixes starts for empty lists).
int pack_scatter(const char* x, int64_t row_bytes, const int32_t* xids,
                 const int64_t* assign, int64_t n, int64_t block,
                 const int64_t* starts_blocks, char* data_out,
                 int32_t* ids_out) {
    // per-list write cursors
    // find nlist as max assign + 1 is caller's business; cursors indexed
    // by list via a second pass: compute offsets by stable order.
    // Simplest parallel-safe scheme: precompute each row's slot serially
    // (cheap), then scatter rows in parallel (memcpy-bound).
    std::vector<int64_t> slot(n);
    {
        // rank within list via running counters
        // (serial O(n), trivial compared to the memcpy traffic)
        std::vector<int64_t> cursor;
        int64_t nlist_guess = 0;
        for (int64_t i = 0; i < n; i++)
            nlist_guess = std::max(nlist_guess, assign[i] + 1);
        cursor.assign(nlist_guess, 0);
        for (int64_t i = 0; i < n; i++) {
            int64_t l = assign[i];
            slot[i] = starts_blocks[l] * block + cursor[l]++;
        }
    }
    parallel_for(n, 16384, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            memcpy(data_out + slot[i] * row_bytes, x + i * row_bytes,
                   (size_t)row_bytes);
            ids_out[slot[i]] = xids[i];
        }
    });
    return 0;
}

// ---------------------------------------------------------------------------
// reverse graph edges: for each node v, the first `cap` sources u (in
// ascending u) with v in fwd[u]. The graph-build counterpart of the
// reference's sequential insertion adding back-links (IndexHNSW.cpp
// add_link); batch form = counting-sort by destination.
// ---------------------------------------------------------------------------

// fwd (n*m) int32 (-1 = empty), fwd_dis (n*m) f32.
// rev_ids ((n*cap) int32) must be pre-filled -1, rev_dis pre-filled +inf.
int reverse_edges(const int32_t* fwd, const float* fwd_dis, int64_t n,
                  int64_t m, int64_t cap, int32_t* rev_ids,
                  float* rev_dis) {
    // slot pass (serial: running per-destination cursors preserve the
    // ascending-source order the numpy/stable-sort path produced)
    std::vector<int32_t> cursor(n, 0);
    std::vector<int64_t> slot(n * m);
    for (int64_t i = 0; i < n; i++) {
        const int32_t* row = fwd + i * m;
        for (int64_t j = 0; j < m; j++) {
            int32_t v = row[j];
            if (v < 0 || v >= n) { slot[i * m + j] = -1; continue; }
            int32_t c = cursor[v]++;
            slot[i * m + j] = c < cap ? (int64_t)v * cap + c : -1;
        }
    }
    // scatter pass (parallel: slots are unique by construction)
    parallel_for(n, 16384, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            for (int64_t j = 0; j < m; j++) {
                int64_t s = slot[i * m + j];
                if (s < 0) continue;
                rev_ids[s] = (int32_t)i;
                rev_dis[s] = fwd_dis[i * m + j];
            }
        }
    });
    return 0;
}

// ---------------------------------------------------------------------------
// squared-norm rows (float32), parallel — fvec_norms_L2sqr
// ---------------------------------------------------------------------------

void fvec_norms_l2sqr(const float* x, int64_t n, int64_t d, float* out) {
    parallel_for(n, 8192, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const float* row = x + i * d;
            double acc = 0;
            for (int64_t j = 0; j < d; j++) acc += (double)row[j] * row[j];
            out[i] = (float)acc;
        }
    });
}

}  // extern "C"
