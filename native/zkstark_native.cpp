// zkstark_tpu native runtime: SHA-256, Fiat-Shamir channel, and a fully
// independent proof verifier.
//
// The reference's native surface is its Rust crate plus two native dependency
// crates: num-modular (Montgomery F_p arithmetic, field.rs:2) and sha2
// (merkle.rs:1, channel.rs:4), with bincode framing (channel.rs:20). This
// library is the TPU framework's host-runtime equivalent: the serial channel
// spine and the verifier's point checks are scalar host work (the wrong shape
// for the TPU), so they live here in C++, exposed to Python over a C ABI via
// ctypes. The verifier is a from-scratch twin of proof.rs:15-149 semantics
// (with challenge replay, which the reference omits) and serves as the
// independent cross-check of the Python verifier and the TPU prover's bytes.
//
// Build: make -C native   (produces libzkstark_native.so)

#include <cstdint>
#include <cstring>
#include <cstdio>

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4), scalar
// ---------------------------------------------------------------------------

namespace sha256 {

static const uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

struct Ctx {
  uint32_t h[8];
  uint8_t buf[64];
  uint64_t total;
  size_t fill;
};

static void init(Ctx &c) {
  static const uint32_t H0[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                 0xa54ff53a, 0x510e527f, 0x9b05688c,
                                 0x1f83d9ab, 0x5be0cd19};
  memcpy(c.h, H0, sizeof(H0));
  c.total = 0;
  c.fill = 0;
}

static void compress(Ctx &c, const uint8_t *p) {
  uint32_t w[64];
  for (int t = 0; t < 16; t++)
    w[t] = (uint32_t(p[4 * t]) << 24) | (uint32_t(p[4 * t + 1]) << 16) |
           (uint32_t(p[4 * t + 2]) << 8) | uint32_t(p[4 * t + 3]);
  for (int t = 16; t < 64; t++) {
    uint32_t s0 = rotr(w[t - 15], 7) ^ rotr(w[t - 15], 18) ^ (w[t - 15] >> 3);
    uint32_t s1 = rotr(w[t - 2], 17) ^ rotr(w[t - 2], 19) ^ (w[t - 2] >> 10);
    w[t] = w[t - 16] + s0 + w[t - 7] + s1;
  }
  uint32_t a = c.h[0], b = c.h[1], cc = c.h[2], d = c.h[3], e = c.h[4],
           f = c.h[5], g = c.h[6], h = c.h[7];
  for (int t = 0; t < 64; t++) {
    uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
    uint32_t ch = (e & f) ^ (~e & g);
    uint32_t t1 = h + S1 + ch + K[t] + w[t];
    uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
    uint32_t maj = (a & b) ^ (a & cc) ^ (b & cc);
    uint32_t t2 = S0 + maj;
    h = g; g = f; f = e; e = d + t1;
    d = cc; cc = b; b = a; a = t1 + t2;
  }
  c.h[0] += a; c.h[1] += b; c.h[2] += cc; c.h[3] += d;
  c.h[4] += e; c.h[5] += f; c.h[6] += g; c.h[7] += h;
}

static void update(Ctx &c, const uint8_t *data, size_t len) {
  c.total += len;
  while (len) {
    size_t take = 64 - c.fill;
    if (take > len) take = len;
    memcpy(c.buf + c.fill, data, take);
    c.fill += take;
    data += take;
    len -= take;
    if (c.fill == 64) {
      compress(c, c.buf);
      c.fill = 0;
    }
  }
}

static void final(Ctx &c, uint8_t out[32]) {
  uint64_t bits = c.total * 8;
  uint8_t pad = 0x80;
  update(c, &pad, 1);
  uint8_t zero = 0;
  while (c.fill != 56) update(c, &zero, 1);
  uint8_t lenb[8];
  for (int i = 0; i < 8; i++) lenb[i] = uint8_t(bits >> (56 - 8 * i));
  update(c, lenb, 8);
  for (int i = 0; i < 8; i++) {
    out[4 * i] = uint8_t(c.h[i] >> 24);
    out[4 * i + 1] = uint8_t(c.h[i] >> 16);
    out[4 * i + 2] = uint8_t(c.h[i] >> 8);
    out[4 * i + 3] = uint8_t(c.h[i]);
  }
}

static void digest(const uint8_t *data, size_t len, uint8_t out[32]) {
  Ctx c;
  init(c);
  update(c, data, len);
  final(c, out);
}

}  // namespace sha256

// ---------------------------------------------------------------------------
// F_p scalar arithmetic, p = 3*2^30 + 1
// ---------------------------------------------------------------------------

namespace field {

static const uint64_t P = 3221225473ULL;

static inline uint64_t mulmod(uint64_t a, uint64_t b) { return a * b % P; }

static uint64_t powmod(uint64_t b, uint64_t e) {
  uint64_t r = 1;
  b %= P;
  while (e) {
    if (e & 1) r = mulmod(r, b);
    b = mulmod(b, b);
    e >>= 1;
  }
  return r;
}

static inline uint64_t inv(uint64_t a) { return powmod(a, P - 2); }
static inline uint64_t sub(uint64_t a, uint64_t b) { return (a + P - b % P) % P; }

}  // namespace field

// ---------------------------------------------------------------------------
// Fiat-Shamir channel (channel.rs:6-37 semantics)
// ---------------------------------------------------------------------------

extern "C" {

// state = SHA256(state || payload)
void zk_channel_commit(uint8_t state[32], const uint8_t *payload, size_t len) {
  sha256::Ctx c;
  sha256::init(c);
  sha256::update(c, state, 32);
  sha256::update(c, payload, len);
  sha256::final(c, state);
}

// draw = BE(state[0..4]); self-commit the LE-serialized draw; return draw.
uint32_t zk_channel_draw(uint8_t state[32]) {
  uint32_t draw = (uint32_t(state[0]) << 24) | (uint32_t(state[1]) << 16) |
                  (uint32_t(state[2]) << 8) | uint32_t(state[3]);
  uint8_t le[4] = {uint8_t(draw), uint8_t(draw >> 8), uint8_t(draw >> 16),
                   uint8_t(draw >> 24)};
  zk_channel_commit(state, le, 4);
  return draw;
}

// Batch SHA-256: n independent 4-byte big-endian u32 leaf hashes (merkle.rs:30).
void zk_leaf_hashes(const uint32_t *values, size_t n, uint8_t *out) {
  for (size_t i = 0; i < n; i++) {
    uint8_t be[4] = {uint8_t(values[i] >> 24), uint8_t(values[i] >> 16),
                     uint8_t(values[i] >> 8), uint8_t(values[i])};
    sha256::digest(be, 4, out + 32 * i);
  }
}

// One Merkle level: out[i] = SHA256(left_i || right_i) over 2n input hashes.
void zk_node_hashes(const uint8_t *children, size_t n_pairs, uint8_t *out) {
  for (size_t i = 0; i < n_pairs; i++)
    sha256::digest(children + 64 * i, 64, out + 32 * i);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Transcript reader (bincode 1.3 fixint-LE framing, channel.rs:20)
// ---------------------------------------------------------------------------

namespace {

struct Reader {
  const uint8_t *p;
  size_t len, pos;
  bool fail = false;

  const uint8_t *take(size_t n) {
    if (pos + n > len) {
      fail = true;
      return nullptr;
    }
    const uint8_t *r = p + pos;
    pos += n;
    return r;
  }
  uint32_t u32() {
    const uint8_t *b = take(4);
    if (!b) return 0;
    return uint32_t(b[0]) | (uint32_t(b[1]) << 8) | (uint32_t(b[2]) << 16) |
           (uint32_t(b[3]) << 24);
  }
  uint64_t u64() {
    const uint8_t *b = take(8);
    if (!b) return 0;
    uint64_t v = 0;
    for (int i = 7; i >= 0; i--) v = (v << 8) | b[i];
    return v;
  }
};

static bool compute_root_from_path(uint32_t element, size_t index,
                                   const uint8_t *path, size_t path_len,
                                   uint8_t out[32]) {
  // merkle.rs:82-110 semantics: hash BE(u32), then fold siblings by parity.
  uint8_t be[4] = {uint8_t(element >> 24), uint8_t(element >> 16),
                   uint8_t(element >> 8), uint8_t(element)};
  uint8_t cur[32];
  sha256::digest(be, 4, cur);
  for (size_t level = 0; level < path_len; level++) {
    uint8_t cat[64];
    const uint8_t *sib = path + 32 * level;
    if (index & 1) {
      memcpy(cat, sib, 32);
      memcpy(cat + 32, cur, 32);
    } else {
      memcpy(cat, cur, 32);
      memcpy(cat + 32, sib, 32);
    }
    sha256::digest(cat, 64, cur);
    index >>= 1;
  }
  memcpy(out, cur, 32);
  return true;
}

struct Replay {
  Reader r;
  uint8_t state[32];

  void absorb(const uint8_t *payload, size_t n) {
    zk_channel_commit(state, payload, n);
  }
  const uint8_t *hash32() {
    const uint8_t *h = r.take(32);
    if (h) absorb(h, 32);
    return h;
  }
  uint32_t u32_absorb() {
    size_t at = r.pos;
    uint32_t v = r.u32();
    if (!r.fail) absorb(r.p + at, 4);
    return v;
  }
  // self-committed challenge: value must equal BE(state[0..4]) pre-absorb
  bool expect_u32(uint32_t *out) {
    uint32_t expected = (uint32_t(state[0]) << 24) | (uint32_t(state[1]) << 16) |
                        (uint32_t(state[2]) << 8) | uint32_t(state[3]);
    uint32_t v = u32_absorb();
    if (r.fail || v != expected) return false;
    *out = v;
    return true;
  }
  // (u32, AuthPath): absorbed as one commit (prover.rs:274-277)
  bool opening(uint32_t *val, const uint8_t **path, size_t *path_len) {
    size_t at = r.pos;
    *val = r.u32();
    uint64_t n = r.u64();
    if (r.fail || n > 64) return false;
    *path = r.take(size_t(n) * 32);
    if (r.fail) return false;
    *path_len = size_t(n);
    absorb(r.p + at, r.pos - at);
    return true;
  }
  bool fri_opening(uint32_t *v0, uint32_t *v1, const uint8_t **p0, size_t *l0,
                   const uint8_t **p1, size_t *l1) {
    size_t at = r.pos;
    *v0 = r.u32();
    *v1 = r.u32();
    uint64_t n0 = r.u64();
    if (r.fail || n0 > 64) return false;
    *p0 = r.take(size_t(n0) * 32);
    uint64_t n1 = r.u64();
    if (r.fail || n1 > 64) return false;
    *p1 = r.take(size_t(n1) * 32);
    if (r.fail) return false;
    *l0 = size_t(n0);
    *l1 = size_t(n1);
    absorb(r.p + at, r.pos - at);
    return true;
  }
};

static void seterr(char *err, size_t cap, const char *msg) {
  if (err && cap) snprintf(err, cap, "%s", msg);
}

}  // namespace

// ---------------------------------------------------------------------------
// Independent verifier (proof.rs:15-149 semantics + challenge replay)
// ---------------------------------------------------------------------------

extern "C" {

// Returns 0 on success; nonzero error code with message in err.
// Config mirrors StarkConfig (protocol/config.py).
int zk_verify(const uint8_t *final_state, const uint8_t *data, size_t data_len,
              uint32_t trace_len, uint32_t blowup, uint32_t coset_offset,
              uint32_t boundary_first, uint32_t boundary_last, char *err,
              size_t err_cap) {
  using namespace field;
  const uint64_t n = uint64_t(trace_len) + 1;          // trace domain
  const uint64_t d = n * blowup;                       // eval domain
  // fri_rounds = log2(n)
  uint32_t rounds = 0;
  for (uint64_t t = n; t > 1; t >>= 1) rounds++;
  const uint64_t query_range = d - 2 * blowup;

  Replay ch{};
  ch.r = Reader{data, data_len, 0};
  memset(ch.state, 0, 32);

  // ---- parse + replay ----
  const uint8_t *f_root = ch.hash32();
  uint32_t alphas[3];
  for (int i = 0; i < 3; i++)
    if (!ch.expect_u32(&alphas[i])) {
      seterr(err, err_cap, "alpha challenge replay mismatch");
      return 2;
    }
  // roots[0] = cp root; betas[0] unused dummy (proof.rs:27)
  const size_t max_rounds = 40;
  if (rounds > max_rounds) {
    seterr(err, err_cap, "too many FRI rounds");
    return 1;
  }
  const uint8_t *roots[max_rounds + 1];
  uint32_t betas[max_rounds + 1];
  betas[0] = 0;
  roots[0] = ch.hash32();
  for (uint32_t i = 1; i <= rounds; i++) {
    if (!ch.expect_u32(&betas[i])) {
      seterr(err, err_cap, "beta challenge replay mismatch");
      return 2;
    }
    roots[i] = ch.hash32();
  }
  uint32_t free_term = ch.u32_absorb();
  uint32_t query_raw;
  if (!ch.expect_u32(&query_raw)) {
    seterr(err, err_cap, "query challenge replay mismatch");
    return 2;
  }
  uint32_t trace_vals[4];
  const uint8_t *trace_paths[4];
  size_t trace_plens[4];
  for (int i = 0; i < 4; i++)
    if (!ch.opening(&trace_vals[i], &trace_paths[i], &trace_plens[i])) {
      seterr(err, err_cap, "bad trace opening");
      return 1;
    }
  uint32_t fv0[max_rounds], fv1[max_rounds];
  const uint8_t *fp0[max_rounds], *fp1[max_rounds];
  size_t fl0[max_rounds], fl1[max_rounds];
  for (uint32_t i = 0; i < rounds; i++)
    if (!ch.fri_opening(&fv0[i], &fv1[i], &fp0[i], &fl0[i], &fp1[i], &fl1[i])) {
      seterr(err, err_cap, "bad FRI opening");
      return 1;
    }
  if (ch.r.fail || !f_root) {
    seterr(err, err_cap, "transcript truncated");
    return 1;
  }
  if (ch.r.pos != data_len) {
    seterr(err, err_cap, "trailing bytes in transcript");
    return 1;
  }
  if (final_state && memcmp(ch.state, final_state, 32) != 0) {
    seterr(err, err_cap, "final channel state mismatch");
    return 2;
  }

  // ---- protocol constants (proof.rs:49-54) ----
  const uint64_t g = powmod(5, (P - 1) / n);
  const uint64_t h = powmod(5, (P - 1) / d);
  const uint64_t test_point = query_raw % query_range;
  const uint64_t x = mulmod(coset_offset, powmod(h, test_point));

  // ---- composition identity (proof.rs:63-77) ----
  {
    uint64_t f_x = trace_vals[0] % P, f_gx = trace_vals[1] % P,
             f_ggx = trace_vals[2] % P;
    uint64_t g_m3 = powmod(g, n - 3), g_m2 = powmod(g, n - 2),
             g_m1 = powmod(g, n - 1);
    uint64_t p0 = mulmod(sub(f_x, boundary_first), inv(sub(x, 1)));
    uint64_t p1 = mulmod(sub(f_x, boundary_last), inv(sub(x, g_m2)));
    uint64_t z = mulmod(sub(powmod(x, n), 1),
                        inv(mulmod(mulmod(sub(x, g_m3), sub(x, g_m2)),
                                   sub(x, g_m1))));
    uint64_t num = sub(sub(f_ggx, mulmod(f_gx, f_gx)), mulmod(f_x, f_x));
    uint64_t p2 = mulmod(num, inv(z));
    uint64_t cp0 = (mulmod(alphas[0] % P, p0) + mulmod(alphas[1] % P, p1) +
                    mulmod(alphas[2] % P, p2)) % P;
    if (cp0 != trace_vals[3] % P) {
      seterr(err, err_cap, "composition identity failed at query point");
      return 3;
    }
  }

  // ---- trace auth paths (proof.rs:80-95) ----
  {
    uint8_t root[32];
    const size_t idx[4] = {test_point, test_point + blowup,
                           test_point + 2 * blowup, test_point};
    const uint8_t *want[4] = {f_root, f_root, f_root, roots[0]};
    for (int i = 0; i < 4; i++) {
      compute_root_from_path(trace_vals[i], idx[i], trace_paths[i],
                             trace_plens[i], root);
      if (memcmp(root, want[i], 32) != 0) {
        seterr(err, err_cap, "trace auth path mismatch");
        return 4;
      }
    }
  }

  // ---- FRI consistency (proof.rs:101-126) ----
  {
    const uint64_t inv2 = inv(2);
    for (uint32_t layer = 0; layer < rounds; layer++) {
      uint64_t xl = powmod(x, 1ULL << layer);
      uint64_t cpx = fv0[layer] % P, cpnx = fv1[layer] % P;
      uint64_t g_xx = mulmod((cpx + cpnx) % P, inv2);
      uint64_t h_xx = mulmod(mulmod(sub(cpx, cpnx), inv2), inv(xl));
      uint64_t calc = (g_xx + mulmod(betas[layer + 1] % P, h_xx)) % P;
      uint64_t nxt = (layer + 1 < rounds) ? fv0[layer + 1] % P : free_term % P;
      if (nxt != calc) {
        seterr(err, err_cap, "FRI consistency failed");
        return 5;
      }
    }
  }

  // ---- FRI auth paths (proof.rs:129-148) ----
  {
    uint8_t root[32];
    for (uint32_t layer = 0; layer < rounds; layer++) {
      uint64_t size = d >> layer;
      size_t i0 = size_t(test_point % size);
      size_t i1 = size_t((test_point + size / 2) % size);
      compute_root_from_path(fv0[layer], i0, fp0[layer], fl0[layer], root);
      if (memcmp(root, roots[layer], 32) != 0) {
        seterr(err, err_cap, "FRI auth path mismatch (x)");
        return 6;
      }
      compute_root_from_path(fv1[layer], i1, fp1[layer], fl1[layer], root);
      if (memcmp(root, roots[layer], 32) != 0) {
        seterr(err, err_cap, "FRI auth path mismatch (-x)");
        return 6;
      }
    }
  }

  return 0;
}

}  // extern "C"
