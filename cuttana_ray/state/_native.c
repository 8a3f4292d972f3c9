/* Native (C) implementation of the sequential Cuttana streaming core.
 *
 * Bit-identical port of the Python reference path:
 *   cuttana_ray/state/buffer.py      (bounded lazy-deletion max-heap buffer)
 *   cuttana_ray/state/core.py        (CuttanaState + FennelScorer + Partitioner)
 *   cuttana_ray/state/refine.py      (Refiner: fix_balance / refine)
 * which in turn mirrors /root/reference/src/{buffer,state,partition,refine,
 * cuttana}.rs semantics (see the Python docstrings for the file:line map and
 * the documented divergences).
 *
 * Parity contract (enforced by tests/test_native_parity.py): for any stream
 * fed in the same order with default scorers, this kernel and the Python
 * path produce IDENTICAL assignments, sub-assignments, refinement parents,
 * cut counts and move counts. The preconditions that make float equality
 * achievable:
 *   - compiled with -ffp-contract=off (no FMA contraction), no -ffast-math;
 *   - every float expression below copies the Python source's association
 *     order and uses the same libm entry points (pow, sqrt) CPython uses;
 *   - tie-breaks draw from the same seeded splitmix64 stream (TieRng in
 *     core.py);
 *   - argmin scans are first-minimum in the same iteration order numpy uses
 *     (row-major, strict '<').
 *
 * Built at first use by cuttana_ray/state/native.py with the system cc; if
 * no compiler is present the engine transparently runs the Python path.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define SENT ((int64_t)1 << 60)

/* ---------------------------------------------------------------- rng -- */

static inline uint64_t splitmix64(uint64_t *state) {
    uint64_t z = (*state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

/* ------------------------------------------------------------- buffer -- */
/* Lazy-deletion max-heap keyed by (score, vertex), mirroring buffer.py:
 * the authoritative score lives in score[]; stale heap entries are skipped
 * at pop time when they no longer match. */

typedef struct {
    double score;
    int64_t v;
} HeapEnt;

typedef struct {
    HeapEnt *heap;
    int64_t heap_len, heap_cap;
    double *score;        /* per-vertex authoritative score */
    uint8_t *in_buf;      /* per-vertex membership flag */
    int64_t *nbr_off;     /* per-vertex offset into arena (valid iff in_buf) */
    int64_t *nbr_len;
    int64_t *arena;       /* copied neighbor ids of buffered vertices */
    int64_t arena_len, arena_cap;
    int64_t len;          /* number of buffered vertices */
    int64_t capacity;
} Buffer;

/* max-heap order: higher score first, then higher vertex id (BTreeMap
 * last_key_value order, buffer.rs:113-118 / buffer.py evict()). */
static inline int heap_gt(HeapEnt a, HeapEnt b) {
    if (a.score != b.score) return a.score > b.score;
    return a.v > b.v;
}

static int heap_push(Buffer *b, double score, int64_t v) {
    if (b->heap_len == b->heap_cap) {
        int64_t nc = b->heap_cap * 2;
        HeapEnt *nh = (HeapEnt *)realloc(b->heap, (size_t)nc * sizeof(HeapEnt));
        if (!nh) return 2;
        b->heap = nh;
        b->heap_cap = nc;
    }
    int64_t i = b->heap_len++;
    b->heap[i].score = score;
    b->heap[i].v = v;
    while (i > 0) {
        int64_t p = (i - 1) / 2;
        if (heap_gt(b->heap[i], b->heap[p])) {
            HeapEnt t = b->heap[i]; b->heap[i] = b->heap[p]; b->heap[p] = t;
            i = p;
        } else break;
    }
    return 0;
}

static void heap_pop(Buffer *b) {
    b->heap[0] = b->heap[--b->heap_len];
    int64_t i = 0;
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, m = i;
        if (l < b->heap_len && heap_gt(b->heap[l], b->heap[m])) m = l;
        if (r < b->heap_len && heap_gt(b->heap[r], b->heap[m])) m = r;
        if (m == i) break;
        HeapEnt t = b->heap[i]; b->heap[i] = b->heap[m]; b->heap[m] = t;
        i = m;
    }
}

/* pop the max valid entry; returns vertex or -1 if buffer empty */
static int64_t buf_evict(Buffer *b) {
    while (b->heap_len > 0) {
        HeapEnt e = b->heap[0];
        heap_pop(b);
        if (b->in_buf[e.v] && b->score[e.v] == e.score) {
            b->in_buf[e.v] = 0;
            b->len--;
            return e.v;
        }
    }
    return -1;
}

/* ---------------------------------------------------- sub-edge hashmap -- */
/* (gsub_a -> gsub_b) -> weight, both directions stored (state.rs:124-135 /
 * core.py add_sub_edge). Open addressing, power-of-two capacity. */

typedef struct {
    uint64_t *keys;   /* key = a * total_subs + b + 1 (0 = empty) */
    int64_t *vals;
    uint64_t cap;     /* power of two */
    uint64_t count;
} EdgeMap;

static int emap_init(EdgeMap *m, uint64_t cap) {
    m->cap = cap;
    m->count = 0;
    m->keys = (uint64_t *)calloc(cap, sizeof(uint64_t));
    m->vals = (int64_t *)calloc(cap, sizeof(int64_t));
    return (m->keys && m->vals) ? 0 : 2;
}

static int emap_add(EdgeMap *m, uint64_t key1, int64_t w);

static int emap_grow(EdgeMap *m) {
    EdgeMap n;
    if (emap_init(&n, m->cap * 2)) return 2;
    for (uint64_t i = 0; i < m->cap; i++)
        if (m->keys[i])
            if (emap_add(&n, m->keys[i], m->vals[i])) return 2;
    free(m->keys); free(m->vals);
    *m = n;
    return 0;
}

static inline uint64_t emap_hash(uint64_t k) {
    k ^= k >> 33; k *= 0xFF51AFD7ED558CCDULL;
    k ^= k >> 33; k *= 0xC4CEB9FE1A85EC53ULL;
    k ^= k >> 33;
    return k;
}

static int emap_add(EdgeMap *m, uint64_t key1, int64_t w) {
    if (m->count * 10 >= m->cap * 7)
        if (emap_grow(m)) return 2;
    uint64_t i = emap_hash(key1) & (m->cap - 1);
    for (;;) {
        if (m->keys[i] == key1) { m->vals[i] += w; return 0; }
        if (m->keys[i] == 0) {
            m->keys[i] = key1; m->vals[i] = w; m->count++;
            return 0;
        }
        i = (i + 1) & (m->cap - 1);
    }
}

/* -------------------------------------------------------------- engine -- */

typedef struct {
    /* config */
    int64_t V, k, ns, total_subs;
    double slack;            /* already widened (state.rs:60-66) */
    double raw_slack;        /* un-widened balance_slack (refine capacities) */
    double gamma_, sub_gamma;
    double theta;
    double degree_threshold; /* buffer scorer denominator (float) */
    int64_t degree_threshold_i;
    int64_t max_buffer;
    int64_t info_gain_threshold;
    int64_t max_refine_moves;
    uint64_t rng;

    /* per-vertex assignment */
    int64_t *part_of, *sub_of;

    /* level sizes + refinement bookkeeping */
    int64_t *partition_sizes;   /* len k */
    int64_t *sub_sizes;         /* len total_subs, by gsub */
    int64_t *sub_parent;        /* len total_subs */
    int64_t *num_sub_in;        /* len k */

    /* running metrics */
    int64_t vertex_count, edge_count, cut_count, v_eff, e_eff;

    /* buffer */
    Buffer buf;

    /* sub-edge coarse graph */
    EdgeMap emap;

    /* first-min tracker for the per-partition sub_sizes row: numpy argmin
     * (first index with the min value) without an O(ns) scan per placement */
    int64_t *sub_mv;      /* len k: current min size in partition row */
    int64_t *sub_fm;      /* len k: first index with that min */
    int64_t *sub_cntmin;  /* len k: #subs at min */

    /* scratch (grown on demand) */
    int64_t *scr_p, *scr_s;       /* neighbor part/sub snapshots */
    int64_t scr_cap;
    int64_t *cand_counts;         /* len max(k, ns): per-candidate counts */
    int64_t *cand_order;          /* first-occurrence candidate list */
    int64_t *ties;                /* candidate/tie list */

    int64_t refine_moves;
    int finalized;
} Ctn;

static int grow_scratch(Ctn *c, int64_t need) {
    if (need <= c->scr_cap) return 0;
    int64_t nc = c->scr_cap;
    while (nc < need) nc *= 2;
    int64_t *np_ = (int64_t *)realloc(c->scr_p, (size_t)nc * sizeof(int64_t));
    if (!np_) return 2;
    c->scr_p = np_;
    int64_t *ns_ = (int64_t *)realloc(c->scr_s, (size_t)nc * sizeof(int64_t));
    if (!ns_) return 2;
    c->scr_s = ns_;
    c->scr_cap = nc;
    return 0;
}

Ctn *ctn_create(int64_t num_vertices, int64_t k, int64_t ns,
                double slack_widened, double raw_slack, double gamma_,
                double sub_gamma,
                double theta, int64_t degree_threshold, int64_t max_buffer,
                int64_t info_gain_threshold, int64_t max_refine_moves,
                uint64_t seed) {
    Ctn *c = (Ctn *)calloc(1, sizeof(Ctn));
    if (!c) return NULL;
    c->V = num_vertices; c->k = k; c->ns = ns; c->total_subs = k * ns;
    c->slack = slack_widened;
    c->raw_slack = raw_slack;
    c->gamma_ = gamma_; c->sub_gamma = sub_gamma; c->theta = theta;
    c->degree_threshold = (double)degree_threshold;
    c->degree_threshold_i = degree_threshold;
    c->max_buffer = max_buffer;
    c->info_gain_threshold = info_gain_threshold;
    c->max_refine_moves = max_refine_moves;
    c->rng = seed;

    int64_t V = num_vertices > 0 ? num_vertices : 1;
    c->part_of = (int64_t *)malloc((size_t)V * sizeof(int64_t));
    c->sub_of = (int64_t *)malloc((size_t)V * sizeof(int64_t));
    c->partition_sizes = (int64_t *)calloc((size_t)k, sizeof(int64_t));
    c->sub_sizes = (int64_t *)calloc((size_t)c->total_subs, sizeof(int64_t));
    c->sub_parent = (int64_t *)malloc((size_t)c->total_subs * sizeof(int64_t));
    c->num_sub_in = (int64_t *)malloc((size_t)k * sizeof(int64_t));
    c->sub_mv = (int64_t *)calloc((size_t)k, sizeof(int64_t));
    c->sub_fm = (int64_t *)calloc((size_t)k, sizeof(int64_t));
    c->sub_cntmin = (int64_t *)malloc((size_t)k * sizeof(int64_t));
    if (!c->part_of || !c->sub_of || !c->partition_sizes || !c->sub_sizes
        || !c->sub_parent || !c->num_sub_in || !c->sub_mv || !c->sub_fm
        || !c->sub_cntmin)
        return NULL;
    for (int64_t i = 0; i < V; i++) c->part_of[i] = -1;
    for (int64_t i = 0; i < V; i++) c->sub_of[i] = -1;
    for (int64_t s = 0; s < c->total_subs; s++) c->sub_parent[s] = s / ns;
    for (int64_t p = 0; p < k; p++) c->num_sub_in[p] = ns;
    for (int64_t p = 0; p < k; p++) c->sub_cntmin[p] = ns;

    c->buf.heap_cap = 1024;
    c->buf.heap = (HeapEnt *)malloc((size_t)c->buf.heap_cap * sizeof(HeapEnt));
    c->buf.score = (double *)calloc((size_t)V, sizeof(double));
    c->buf.in_buf = (uint8_t *)calloc((size_t)V, sizeof(uint8_t));
    c->buf.nbr_off = (int64_t *)malloc((size_t)V * sizeof(int64_t));
    c->buf.nbr_len = (int64_t *)malloc((size_t)V * sizeof(int64_t));
    c->buf.arena_cap = 4096;
    c->buf.arena = (int64_t *)malloc((size_t)c->buf.arena_cap * sizeof(int64_t));
    c->buf.capacity = max_buffer;
    if (!c->buf.heap || !c->buf.score || !c->buf.in_buf || !c->buf.nbr_off
        || !c->buf.nbr_len || !c->buf.arena)
        return NULL;

    if (emap_init(&c->emap, 1 << 16)) return NULL;

    c->scr_cap = 1024;
    c->scr_p = (int64_t *)malloc((size_t)c->scr_cap * sizeof(int64_t));
    c->scr_s = (int64_t *)malloc((size_t)c->scr_cap * sizeof(int64_t));
    int64_t cc = k > ns ? k : ns;
    c->cand_counts = (int64_t *)calloc((size_t)cc, sizeof(int64_t));
    c->cand_order = (int64_t *)malloc((size_t)cc * sizeof(int64_t));
    c->ties = (int64_t *)malloc((size_t)(cc + 1) * sizeof(int64_t));
    if (!c->scr_p || !c->scr_s || !c->cand_counts || !c->cand_order || !c->ties)
        return NULL;
    return c;
}

void ctn_destroy(Ctn *c) {
    if (!c) return;
    free(c->part_of); free(c->sub_of); free(c->partition_sizes);
    free(c->sub_sizes); free(c->sub_parent); free(c->num_sub_in);
    free(c->sub_mv); free(c->sub_fm); free(c->sub_cntmin);
    free(c->buf.heap); free(c->buf.score); free(c->buf.in_buf);
    free(c->buf.nbr_off); free(c->buf.nbr_len); free(c->buf.arena);
    free(c->emap.keys); free(c->emap.vals);
    free(c->scr_p); free(c->scr_s); free(c->cand_counts); free(c->cand_order);
    free(c->ties);
    free(c);
}

/* ------------------------------------------ sub-row first-min tracker -- */

static void sub_rescan(Ctn *c, int64_t p) {
    int64_t base = p * c->ns, mv = SENT, fm = 0, cnt = 0;
    for (int64_t j = 0; j < c->ns; j++) {
        int64_t s = c->sub_sizes[base + j];
        if (s < mv) { mv = s; fm = j; cnt = 1; }
        else if (s == mv) cnt++;
    }
    c->sub_mv[p] = mv; c->sub_fm[p] = fm; c->sub_cntmin[p] = cnt;
}

static void sub_inc(Ctn *c, int64_t p, int64_t j) {
    int64_t base = p * c->ns;
    int64_t old = c->sub_sizes[base + j]++;
    if (old != c->sub_mv[p]) return;
    if (--c->sub_cntmin[p] == 0) { sub_rescan(c, p); return; }
    if (j == c->sub_fm[p]) {
        int64_t jj = j + 1;
        while (c->sub_sizes[base + jj] != c->sub_mv[p]) jj++;
        c->sub_fm[p] = jj;
    }
}

/* ------------------------------------------------------- FENNEL scorer -- */
/* Port of FennelScorer.find_best (core.py). `sizes` is the level's size
 * array (partition_sizes for the global level, the sub row for the sub
 * level); `smallest` is the precomputed first-argmin of that array. */

static int64_t find_best(Ctn *c, double gamma_, const int64_t *nbr_lvl,
                         int64_t deg, const int64_t *sizes, int64_t smallest,
                         int64_t num_partitions, int64_t vertex_count,
                         int64_t edge_count) {
    int64_t n_placed = 0, n_order = 0;
    int64_t *counts = c->cand_counts, *order = c->cand_order;
    for (int64_t i = 0; i < deg; i++) {
        int64_t p = nbr_lvl[i];
        if (p >= 0) {
            n_placed++;
            if (counts[p] == 0) order[n_order++] = p;
            counts[p]++;
        }
    }
    if (!n_placed) return smallest;

    double threshold = (1.0 + c->slack)
        * ((double)vertex_count / (double)num_partitions);

    /* candidate order: first-occurrence when n_placed <= 32, else ascending
     * partition id (core.py find_best) */
    int64_t n_cand = 0;
    int64_t *cand_iter = c->ties; /* reuse ties buffer as candidate list */
    if (n_placed <= 32) {
        for (int64_t i = 0; i < n_order; i++)
            if (sizes[order[i]] < threshold) cand_iter[n_cand++] = order[i];
    } else {
        /* ascending: scan the touched partitions in id order */
        /* (order[] holds the distinct ids; sort it) */
        for (int64_t i = 1; i < n_order; i++) {   /* insertion sort: n_order
                                                     is #distinct partitions,
                                                     small in practice */
            int64_t key = order[i], j = i - 1;
            while (j >= 0 && order[j] > key) { order[j + 1] = order[j]; j--; }
            order[j + 1] = key;
        }
        for (int64_t i = 0; i < n_order; i++)
            if (sizes[order[i]] < threshold) cand_iter[n_cand++] = order[i];
    }
    if (!n_cand) {
        for (int64_t i = 0; i < n_order; i++) counts[order[i]] = 0;
        return smallest;
    }

    int64_t result;
    /* ties share cand_iter's storage tail-first; simpler: separate walk */
    if (gamma_ == 1.0) {
        if (n_cand == 1) {
            result = cand_iter[0];
        } else {
            int64_t top = -1, n_ties = 0;
            for (int64_t i = 0; i < n_cand; i++) {
                int64_t cnt = counts[cand_iter[i]];
                if (cnt > top) { top = cnt; n_ties = 0; cand_iter[n_ties++] = cand_iter[i]; }
                else if (cnt == top) cand_iter[n_ties++] = cand_iter[i];
            }
            result = (n_ties == 1) ? cand_iter[0]
                : cand_iter[splitmix64(&c->rng) % (uint64_t)n_ties];
        }
    } else {
        double alpha = (edge_count == 0) ? 0.0
            : pow((double)num_partitions, gamma_ - 1.0) * (double)vertex_count
              / pow((double)edge_count, gamma_);
        double alpha_g = alpha * gamma_;
        double exp_ = gamma_ - 1.0;
        int is_sqrt = (exp_ == 0.5);
        double top = 0.0;
        int have_top = 0;
        int64_t n_ties = 0;
        /* ties must not clobber unread candidates: compact in place is safe
         * because ties only ever hold already-visited cand_iter entries and
         * n_ties <= i+1 at each step */
        for (int64_t i = 0; i < n_cand; i++) {
            int64_t p = cand_iter[i];
            double sz = (double)sizes[p];
            double pen = is_sqrt ? alpha_g * sqrt(sz) : alpha_g * pow(sz, exp_);
            double s = (double)counts[p] - pen;
            if (!have_top || s > top) { have_top = 1; top = s; n_ties = 0; cand_iter[n_ties++] = p; }
            else if (s == top) cand_iter[n_ties++] = p;
        }
        double sz_s = (double)sizes[smallest];
        double pen_s = is_sqrt ? alpha_g * sqrt(sz_s) : alpha_g * pow(sz_s, exp_);
        if (-pen_s > top) {
            for (int64_t i = 0; i < n_order; i++) counts[order[i]] = 0;
            return smallest;
        }
        if (-pen_s == top) {
            int present = 0;
            for (int64_t i = 0; i < n_ties; i++)
                if (cand_iter[i] == smallest) { present = 1; break; }
            if (!present) cand_iter[n_ties++] = smallest;
        }
        result = (n_ties == 1) ? cand_iter[0]
            : cand_iter[splitmix64(&c->rng) % (uint64_t)n_ties];
    }
    for (int64_t i = 0; i < n_order; i++) counts[order[i]] = 0;
    return result;
}

/* --------------------------------------------------------- placement -- */
/* Port of Partitioner.partition (core.py). Returns 0 or error code. */

static int place(Ctn *c, int64_t v, const int64_t *nbrs, int64_t deg) {
    int64_t k = c->k, ns = c->ns;
    double threshold = (1.0 + c->slack) * ((double)c->vertex_count / (double)k);
    int room = 0;
    for (int64_t p = 0; p < k; p++)
        if ((double)c->partition_sizes[p] < threshold) { room = 1; break; }
    if (!room) return 1; /* CapacityError */

    if (grow_scratch(c, deg)) return 2;
    int64_t *np_ = c->scr_p, *ns_ = c->scr_s;
    for (int64_t i = 0; i < deg; i++) {
        int64_t nb = nbrs[i];
        np_[i] = c->part_of[nb];
        ns_[i] = c->sub_of[nb];
    }

    /* global level: smallest = first-argmin over k (O(k)) */
    int64_t smallest = 0;
    {
        int64_t mv = c->partition_sizes[0];
        for (int64_t p = 1; p < k; p++)
            if (c->partition_sizes[p] < mv) { mv = c->partition_sizes[p]; smallest = p; }
    }
    int64_t best = find_best(c, c->gamma_, np_, deg, c->partition_sizes,
                             smallest, k, c->vertex_count, c->edge_count);
    c->part_of[v] = best;
    c->partition_sizes[best] += 1;

    for (int64_t i = 0; i < deg; i++)
        if (np_[i] >= 0 && np_[i] != best) c->cut_count++;

    /* sub level within `best`: neighbors in the same parent only */
    int64_t m = 0;
    for (int64_t i = 0; i < deg; i++)
        if (np_[i] == best) np_[m++] = ns_[i];  /* reuse np_ as sub list */
    /* NOTE: np_ is consumed before being overwritten only up to index i,
     * and m <= i always, so the in-place compaction is safe; ns_ still
     * holds the full sub snapshot for the edge pass below. */
    int64_t best_sub = find_best(c, c->sub_gamma, np_, m,
                                 c->sub_sizes + best * ns, c->sub_fm[best],
                                 ns, c->v_eff, c->e_eff);
    c->sub_of[v] = best_sub;
    int64_t g = best * ns + best_sub;
    sub_inc(c, best, best_sub);

    /* sub<->sub coarse-graph weights for ALL placed neighbors (divergence
     * from the stub-scored reference, documented in core.py partition()).
     * Python used the pre-assignment snapshot; re-reading part_of/sub_of is
     * equivalent because only v itself changed, and nb == v (self-loop,
     * snapshot -1) is skipped explicitly. */
    for (int64_t i = 0; i < deg; i++) {
        int64_t nb = nbrs[i];
        if (nb == v) continue;
        int64_t p = c->part_of[nb];
        if (p >= 0) {
            int64_t gs = p * ns + c->sub_of[nb];
            if (gs != g) {
                uint64_t ts = (uint64_t)c->total_subs;
                if (emap_add(&c->emap, (uint64_t)g * ts + (uint64_t)gs + 1, 1))
                    return 2;
                if (emap_add(&c->emap, (uint64_t)gs * ts + (uint64_t)g + 1, 1))
                    return 2;
            }
        }
    }
    return 0;
}

/* --------------------------------------------------------- buffer ops -- */

static int buf_insert(Ctn *c, int64_t v, const int64_t *nbrs, int64_t deg) {
    Buffer *b = &c->buf;
    double score;
    if (deg == 0) {
        score = 0.0;
    } else {
        int64_t num_placed = 0;
        for (int64_t i = 0; i < deg; i++)
            if (c->part_of[nbrs[i]] >= 0) num_placed++;
        score = c->theta * ((double)num_placed / (double)deg)
            + (double)deg / c->degree_threshold;
    }
    if (b->arena_len + deg > b->arena_cap) {
        int64_t nc = b->arena_cap;
        while (nc < b->arena_len + deg) nc *= 2;
        int64_t *na = (int64_t *)realloc(b->arena, (size_t)nc * sizeof(int64_t));
        if (!na) return 2;
        b->arena = na; b->arena_cap = nc;
    }
    memcpy(b->arena + b->arena_len, nbrs, (size_t)deg * sizeof(int64_t));
    b->nbr_off[v] = b->arena_len;
    b->nbr_len[v] = deg;
    b->arena_len += deg;
    b->score[v] = score;
    b->in_buf[v] = 1;
    b->len++;
    return heap_push(b, score, v);
}

static int buf_update_scores(Ctn *c, const int64_t *nbrs, int64_t deg) {
    Buffer *b = &c->buf;
    for (int64_t i = 0; i < deg; i++) {
        int64_t nb = nbrs[i];
        if (!b->in_buf[nb]) continue;
        if (b->nbr_len[nb] == 0) continue; /* keep 0.0 score (buffer.py) */
        double nsc = b->score[nb] + c->theta / (double)b->nbr_len[nb];
        b->score[nb] = nsc;
        if (heap_push(b, nsc, nb)) return 2;
    }
    return 0;
}

/* one consume() step (partitioner.py consume / cuttana.rs:30-46) */
static int consume_row(Ctn *c, int64_t v, const int64_t *nbrs, int64_t deg) {
    c->vertex_count += 1;
    c->edge_count += deg;
    c->v_eff = c->vertex_count / c->k;
    c->e_eff = c->edge_count / c->k;

    int rc;
    if (deg >= c->degree_threshold_i) {
        if ((rc = place(c, v, nbrs, deg))) return rc;
        if ((rc = buf_update_scores(c, nbrs, deg))) return rc;
    } else {
        if ((rc = buf_insert(c, v, nbrs, deg))) return rc;
    }
    if (c->buf.len >= c->buf.capacity) {
        int64_t ev = buf_evict(&c->buf);
        if (ev >= 0) {
            const int64_t *en = c->buf.arena + c->buf.nbr_off[ev];
            int64_t ed = c->buf.nbr_len[ev];
            if ((rc = place(c, ev, en, ed))) return rc;
            if ((rc = buf_update_scores(c, en, ed))) return rc;
        }
    }
    return 0;
}

int ctn_consume(Ctn *c, int64_t nrows, const int64_t *vertices,
                const int64_t *offsets, const int64_t *flat) {
    for (int64_t r = 0; r < nrows; r++) {
        int rc = consume_row(c, vertices[r], flat + offsets[r],
                             offsets[r + 1] - offsets[r]);
        if (rc) return rc;
    }
    return 0;
}

/* ---------------------------------------------------------- refinement -- */
/* Port of refine.py (Refiner). All-integer arithmetic. */

typedef struct {
    int64_t *cuts;       /* total_subs x k */
    int64_t *csr_off;    /* total_subs + 1 */
    int64_t *csr_nbr;
    int64_t *csr_w;
    int64_t max_parent, max_sub, refine_capacity;
    int64_t moves;
} Ref;

static int build_csr(Ctn *c, Ref *r) {
    int64_t T = c->total_subs;
    r->csr_off = (int64_t *)calloc((size_t)T + 1, sizeof(int64_t));
    if (!r->csr_off) return 2;
    EdgeMap *m = &c->emap;
    uint64_t ts = (uint64_t)T;
    for (uint64_t i = 0; i < m->cap; i++)
        if (m->keys[i]) r->csr_off[(m->keys[i] - 1) / ts + 1]++;
    for (int64_t s = 0; s < T; s++) r->csr_off[s + 1] += r->csr_off[s];
    int64_t nnz = r->csr_off[T];
    r->csr_nbr = (int64_t *)malloc((size_t)(nnz ? nnz : 1) * sizeof(int64_t));
    r->csr_w = (int64_t *)malloc((size_t)(nnz ? nnz : 1) * sizeof(int64_t));
    if (!r->csr_nbr || !r->csr_w) return 2;
    int64_t *fill = (int64_t *)malloc((size_t)T * sizeof(int64_t));
    if (!fill) return 2;
    memcpy(fill, r->csr_off, (size_t)T * sizeof(int64_t));
    for (uint64_t i = 0; i < m->cap; i++)
        if (m->keys[i]) {
            uint64_t key = m->keys[i] - 1;
            int64_t a = (int64_t)(key / ts), b = (int64_t)(key % ts);
            int64_t at = fill[a]++;
            r->csr_nbr[at] = b;
            r->csr_w[at] = m->vals[i];
        }
    free(fill);
    return 0;
}

/* compute_edge_cuts (refine.py / state.rs:169-189) */
static int build_cuts(Ctn *c, Ref *r) {
    int64_t T = c->total_subs, k = c->k;
    r->cuts = (int64_t *)calloc((size_t)(T * k), sizeof(int64_t));
    if (!r->cuts) return 2;
    for (int64_t s = 0; s < T; s++) {
        int64_t lo = r->csr_off[s], hi = r->csr_off[s + 1];
        if (lo == hi) continue;
        int64_t total = 0;
        for (int64_t e = lo; e < hi; e++) total += r->csr_w[e];
        int64_t *row = r->cuts + s * k;
        for (int64_t j = 0; j < k; j++) row[j] += total;
        for (int64_t e = lo; e < hi; e++)
            row[c->sub_parent[r->csr_nbr[e]]] -= r->csr_w[e];
    }
    return 0;
}

static void ref_move(Ctn *c, Ref *r, int64_t s, int64_t frm, int64_t to) {
    int64_t k = c->k;
    for (int64_t e = r->csr_off[s]; e < r->csr_off[s + 1]; e++) {
        int64_t nbr = r->csr_nbr[e], w = r->csr_w[e];
        r->cuts[nbr * k + to] -= w;
        r->cuts[nbr * k + frm] += w;
    }
    int64_t sz = c->sub_sizes[s];
    c->partition_sizes[frm] -= sz;
    c->partition_sizes[to] += sz;
    c->sub_parent[s] = to;
    c->num_sub_in[frm] -= 1;
    c->num_sub_in[to] += 1;
    r->moves++;
}

/* _drain_partition (refine.py) — returns 1 if any move applied */
static int drain_partition(Ctn *c, Ref *r, int64_t frm, int *err) {
    int64_t T = c->total_subs, k = c->k;
    int64_t m = 0;
    for (int64_t s = 0; s < T; s++)
        if (c->sub_parent[s] == frm && c->sub_sizes[s] > 0) m++;
    if (!m) return 0;
    int64_t *subs = (int64_t *)malloc((size_t)m * sizeof(int64_t));
    int64_t *sub_sz = (int64_t *)malloc((size_t)m * sizeof(int64_t));
    int64_t *cost = (int64_t *)malloc((size_t)(m * k) * sizeof(int64_t));
    int64_t *pos = (int64_t *)malloc((size_t)T * sizeof(int64_t));
    uint8_t *alive = (uint8_t *)malloc((size_t)m);
    if (!subs || !sub_sz || !cost || !pos || !alive) { *err = 2; return 0; }
    for (int64_t s = 0; s < T; s++) pos[s] = -1;
    int64_t i2 = 0;
    for (int64_t s = 0; s < T; s++)
        if (c->sub_parent[s] == frm && c->sub_sizes[s] > 0) {
            subs[i2] = s; pos[s] = i2; sub_sz[i2] = c->sub_sizes[s];
            int64_t *row = cost + i2 * k;
            int64_t base_frm = r->cuts[s * k + frm];
            for (int64_t j = 0; j < k; j++)
                row[j] = r->cuts[s * k + j] - base_frm;
            row[frm] = SENT;
            alive[i2] = 1;
            i2++;
        }
    int progress = 0;
    while (c->partition_sizes[frm] > r->max_parent
           && r->moves < c->max_refine_moves) {
        int64_t best = SENT, bi = -1, bj = -1;
        for (int64_t i = 0; i < m; i++) {
            const int64_t *row = cost + i * k;
            for (int64_t j = 0; j < k; j++) {
                int valid = (c->partition_sizes[j] < r->max_parent)
                    && (c->num_sub_in[j] < r->max_sub)
                    && (c->partition_sizes[j] + sub_sz[i] <= r->max_parent);
                int64_t v = valid ? row[j] : SENT;
                if (v < best) { best = v; bi = i; bj = j; }
            }
        }
        if (best >= SENT) break;
        int64_t s = subs[bi];
        ref_move(c, r, s, frm, bj);
        progress = 1;
        alive[bi] = 0;
        for (int64_t j = 0; j < k; j++) cost[bi * k + j] = SENT;
        for (int64_t e = r->csr_off[s]; e < r->csr_off[s + 1]; e++) {
            int64_t g = r->csr_nbr[e];
            int64_t rr = pos[g];
            if (rr >= 0 && alive[rr]) {
                int64_t *row = cost + rr * k;
                int64_t base_frm = r->cuts[subs[rr] * k + frm];
                for (int64_t j = 0; j < k; j++)
                    row[j] = r->cuts[subs[rr] * k + j] - base_frm;
                row[frm] = SENT;
            }
        }
    }
    free(subs); free(sub_sz); free(cost); free(pos); free(alive);
    return progress;
}

static int fix_balance(Ctn *c, Ref *r) {
    int err = 0;
    while (r->moves < c->max_refine_moves) {
        int found_over = 0, any_prog = 0;
        for (int64_t f = 0; f < c->k; f++) {
            if (c->partition_sizes[f] > r->max_parent) {
                found_over = 1;
                if (drain_partition(c, r, f, &err)) { any_prog = 1; break; }
                if (err) return err;
            }
        }
        if (!found_over || !any_prog) return 0;
    }
    return 0;
}

/* refine (refine.py) with incremental best tracking */
static int refine_loop(Ctn *c, Ref *r) {
    int64_t T = c->total_subs, k = c->k;
    int64_t n = 0;
    for (int64_t s = 0; s < T; s++)
        if (r->csr_off[s + 1] > r->csr_off[s] && c->sub_sizes[s] > 0) n++;
    if (!n) return 0;
    int64_t *active = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    int64_t *pos = (int64_t *)malloc((size_t)T * sizeof(int64_t));
    int64_t *sub_sz = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    int64_t *best_to = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    int64_t *best_cost = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    int64_t *delta = (int64_t *)malloc((size_t)k * sizeof(int64_t));
    int64_t *dirty = (int64_t *)malloc((size_t)n * sizeof(int64_t));
    uint8_t *in_dirty = (uint8_t *)calloc((size_t)n, 1);
    if (!active || !pos || !sub_sz || !best_to || !best_cost || !delta
        || !dirty || !in_dirty)
        return 2;
    for (int64_t s = 0; s < T; s++) pos[s] = -1;
    int64_t i2 = 0;
    for (int64_t s = 0; s < T; s++)
        if (r->csr_off[s + 1] > r->csr_off[s] && c->sub_sizes[s] > 0) {
            active[i2] = s; pos[s] = i2; sub_sz[i2] = c->sub_sizes[s]; i2++;
        }

    /* rescore row i */
#define RESCORE(i) do {                                                     \
        int64_t a_ = active[(i)];                                           \
        int64_t par_ = c->sub_parent[a_];                                   \
        const int64_t *cr_ = r->cuts + a_ * k;                              \
        int64_t base_ = cr_[par_];                                          \
        int64_t bt_ = 0, bc_ = SENT;                                        \
        for (int64_t j_ = 0; j_ < k; j_++) {                                \
            int64_t d_ = cr_[j_] - base_;                                   \
            if (j_ == par_ || c->num_sub_in[j_] >= r->max_sub               \
                || c->partition_sizes[j_] + sub_sz[(i)] > r->refine_capacity) \
                d_ = SENT;                                                  \
            if (d_ < bc_) { bc_ = d_; bt_ = j_; }                           \
        }                                                                   \
        best_to[(i)] = bt_; best_cost[(i)] = bc_;                           \
    } while (0)

    for (int64_t i = 0; i < n; i++) RESCORE(i);

    while (r->moves < c->max_refine_moves) {
        int64_t bi = 0, bc = best_cost[0];
        for (int64_t i = 1; i < n; i++)
            if (best_cost[i] < bc) { bc = best_cost[i]; bi = i; }
        if (bc >= -c->info_gain_threshold) break;
        int64_t s = active[bi];
        int64_t frm = c->sub_parent[s];
        int64_t to = best_to[bi];
        ref_move(c, r, s, frm, to);

        int64_t nd = 0;
        dirty[nd++] = bi; in_dirty[bi] = 1;
        for (int64_t e = r->csr_off[s]; e < r->csr_off[s + 1]; e++) {
            int64_t rr = pos[r->csr_nbr[e]];
            if (rr >= 0 && !in_dirty[rr]) { dirty[nd++] = rr; in_dirty[rr] = 1; }
        }
        for (int64_t i = 0; i < n; i++) {
            if (best_to[i] == to && !in_dirty[i]
                && (c->partition_sizes[to] + sub_sz[i] > r->refine_capacity
                    || c->num_sub_in[to] >= r->max_sub)) {
                dirty[nd++] = i; in_dirty[i] = 1;
            }
        }
        for (int64_t d = 0; d < nd; d++) { RESCORE(dirty[d]); in_dirty[dirty[d]] = 0; }

        if (c->num_sub_in[frm] < r->max_sub) {
            for (int64_t i = 0; i < n; i++) {
                int64_t a = active[i];
                int64_t par = c->sub_parent[a];
                int64_t costf = r->cuts[a * k + frm] - r->cuts[a * k + par];
                if (par != frm
                    && c->partition_sizes[frm] + sub_sz[i] <= r->refine_capacity
                    && costf < best_cost[i]) {
                    best_cost[i] = costf;
                    best_to[i] = frm;
                }
            }
        }
    }
#undef RESCORE
    free(active); free(pos); free(sub_sz); free(best_to); free(best_cost);
    free(delta); free(dirty); free(in_dirty);
    return 0;
}

int ctn_finalize(Ctn *c) {
    if (c->finalized) return 3;
    c->finalized = 1;
    /* drain (cuttana.rs:48-51) */
    for (;;) {
        int64_t v = buf_evict(&c->buf);
        if (v < 0) break;
        const int64_t *en = c->buf.arena + c->buf.nbr_off[v];
        int64_t ed = c->buf.nbr_len[v];
        int rc = place(c, v, en, ed);
        if (rc) return rc;
        if ((rc = buf_update_scores(c, en, ed))) return rc;
    }

    /* fix_balance -> refine -> fix_balance (cuttana.rs:53-56), capacities
     * from the RAW balance_slack (refine.py Refiner.__init__) */
    Ref r;
    memset(&r, 0, sizeof(r));
    {
        double v = (double)c->vertex_count;
        double kk = (double)c->k;
        r.max_parent = (int64_t)(v / kk * (1.0 + c->raw_slack)) + 1;
        r.max_sub = (int64_t)((double)c->total_subs / kk * 1.5) + 1;
        r.refine_capacity = (int64_t)((double)r.max_parent * 1.1);
    }
    int rc = build_csr(c, &r);
    if (!rc) rc = build_cuts(c, &r);
    if (!rc) rc = fix_balance(c, &r);
    if (!rc) rc = refine_loop(c, &r);
    if (!rc) rc = fix_balance(c, &r);
    c->refine_moves = r.moves;
    free(r.cuts); free(r.csr_off); free(r.csr_nbr); free(r.csr_w);
    return rc;
}

/* ------------------------------------------------------------ getters -- */

void ctn_get_assign(Ctn *c, int64_t *part_out, int64_t *sub_out) {
    memcpy(part_out, c->part_of, (size_t)c->V * sizeof(int64_t));
    memcpy(sub_out, c->sub_of, (size_t)c->V * sizeof(int64_t));
}

void ctn_get_sub_parent(Ctn *c, int64_t *out) {
    memcpy(out, c->sub_parent, (size_t)c->total_subs * sizeof(int64_t));
}

int64_t ctn_vertex_count(Ctn *c) { return c->vertex_count; }
int64_t ctn_edge_count(Ctn *c) { return c->edge_count; }
int64_t ctn_cut_count(Ctn *c) { return c->cut_count; }
int64_t ctn_refine_moves(Ctn *c) { return c->refine_moves; }
