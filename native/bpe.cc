// Native BPE merge engine for mars5_tts_tpu.text.minbpe.
//
// Implements the same greedy lowest-rank-first merge as the Python
// `_merge_ids` (doubly-linked list + lazy min-heap), callable through ctypes.
// The speech-code BPE over long utterances (thousands of codec frames) is the
// pipeline's one CPU-bound stage; this runs it at C++ speed.
//
// Contract: ranks are the minted token ids themselves (minted ids increase in
// merge-application order), exactly as the minbpe format defines.

#include <cstddef>
#include <cstdint>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

inline uint64_t pack(int32_t a, int32_t b) {
    return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
           static_cast<uint32_t>(b);
}

struct HeapEntry {
    int32_t rank;
    int32_t pos;
    bool operator>(const HeapEntry& o) const {
        return rank != o.rank ? rank > o.rank : pos > o.pos;
    }
};

}  // namespace

extern "C" {

// Apply all merges to `ids` (length n). Merge table given as parallel arrays
// (pair_a[i], pair_b[i]) -> minted id pair_id[i]. Writes the merged sequence
// into `out` (capacity >= n) and returns its length. Returns -1 on error.
int32_t bpe_merge(const int32_t* ids_in, int32_t n,
                  const int32_t* pair_a, const int32_t* pair_b,
                  const int32_t* pair_id, int32_t n_merges,
                  int32_t* out) {
    if (n <= 0) return 0;
    if (n == 1) { out[0] = ids_in[0]; return 1; }

    std::unordered_map<uint64_t, int32_t> ranks;
    ranks.reserve(static_cast<size_t>(n_merges) * 2);
    for (int32_t i = 0; i < n_merges; ++i) {
        ranks.emplace(pack(pair_a[i], pair_b[i]), pair_id[i]);
    }

    std::vector<int32_t> ids(ids_in, ids_in + n);
    std::vector<int32_t> nxt(n), prv(n);
    std::vector<char> alive(n, 1);
    for (int32_t i = 0; i < n; ++i) { nxt[i] = i + 1 < n ? i + 1 : -1; prv[i] = i - 1; }

    std::priority_queue<HeapEntry, std::vector<HeapEntry>, std::greater<HeapEntry>> heap;
    for (int32_t i = 0; i + 1 < n; ++i) {
        auto it = ranks.find(pack(ids[i], ids[i + 1]));
        if (it != ranks.end()) heap.push({it->second, i});
    }

    while (!heap.empty()) {
        HeapEntry e = heap.top();
        heap.pop();
        int32_t i = e.pos;
        if (!alive[i]) continue;
        int32_t j = nxt[i];
        if (j == -1 || !alive[j]) continue;
        auto it = ranks.find(pack(ids[i], ids[j]));
        if (it == ranks.end() || it->second != e.rank) continue;  // stale

        ids[i] = e.rank;  // minted id == rank
        alive[j] = 0;
        int32_t k = nxt[j];
        nxt[i] = k;
        if (k != -1) {
            prv[k] = i;
            auto r = ranks.find(pack(ids[i], ids[k]));
            if (r != ranks.end()) heap.push({r->second, i});
        }
        int32_t p = prv[i];
        if (p != -1 && alive[p]) {
            auto r = ranks.find(pack(ids[p], ids[i]));
            if (r != ranks.end()) heap.push({r->second, p});
        }
    }

    int32_t m = 0;
    for (int32_t i = 0; i < n; ++i) {
        if (alive[i]) out[m++] = ids[i];
    }
    return m;
}

}  // extern "C"
