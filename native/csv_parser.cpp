// Fast parser for AMID dual-domain CSVs.
//
// The reference parses each row's JSON sequences with python json.loads in
// every DataLoader worker every epoch (dataset_seq.py:177-180). amid_tpu
// parses once at startup; this native parser makes that one pass ~20x
// faster than the python csv+json path for the large (80k-row) splits and
// is the template for industrial-scale ingestion.
//
// Format: header then rows  user_id,"[i, j, ...]","[...]",domain_id[,ob_label]
// (quotes optional; pandas also writes unquoted empty lists as []).
//
// C ABI (ctypes-friendly): parse to an opaque handle, read out flat arrays.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

struct AmidParsed {
  std::vector<int64_t> users;
  std::vector<int32_t> domains;
  std::vector<int32_t> ob_labels;
  // CSR layout for the two sequence columns
  std::vector<int64_t> seq1_offsets;  // n+1
  std::vector<int64_t> seq2_offsets;  // n+1
  std::vector<int64_t> seq1_values;
  std::vector<int64_t> seq2_values;
};

static void parse_int_list(const char* s, const char* end,
                           std::vector<int64_t>* out) {
  // s..end covers the cell contents, e.g. [1, 2, 3] possibly quoted
  const char* p = s;
  while (p < end) {
    if (*p >= '0' && *p <= '9') {
      int64_t v = 0;
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
      }
      out->push_back(v);
    } else {
      ++p;
    }
  }
}

// Splits a CSV line into cells respecting double quotes. Returns cell
// (start, end) pairs in `cells`.
static void split_line(const char* line, const char* end,
                       std::vector<std::pair<const char*, const char*>>* cells) {
  cells->clear();
  const char* p = line;
  while (p <= end) {
    const char* cell_start = p;
    const char* cell_end;
    if (p < end && *p == '"') {
      ++p;
      cell_start = p;
      while (p < end && *p != '"') ++p;
      cell_end = p;
      if (p < end) ++p;          // closing quote
      if (p < end && *p == ',') ++p;
    } else {
      while (p < end && *p != ',') ++p;
      cell_end = p;
      if (p < end) ++p;
    }
    cells->emplace_back(cell_start, cell_end);
    if (cell_end == end && (end == line || *(end - 1) != ',')) break;
    if (p > end) break;
  }
}

void* amid_parse(const char* path, int with_ob) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(size, '\0');
  if (fread(&buf[0], 1, size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* out = new AmidParsed();
  out->seq1_offsets.push_back(0);
  out->seq2_offsets.push_back(0);

  const char* p = buf.data();
  const char* bend = p + size;
  // skip header line
  while (p < bend && *p != '\n') ++p;
  if (p < bend) ++p;

  std::vector<std::pair<const char*, const char*>> cells;
  while (p < bend) {
    const char* line = p;
    // find line end, respecting quotes (sequences contain no newlines in
    // this format, so a plain scan is fine)
    while (p < bend && *p != '\n') ++p;
    const char* lend = p;
    if (lend > line && *(lend - 1) == '\r') --lend;
    if (p < bend) ++p;
    if (lend == line) continue;  // blank line

    split_line(line, lend, &cells);
    size_t need = with_ob ? 5 : 4;
    if (cells.size() < need) {
      delete out;
      return nullptr;
    }
    out->users.push_back(strtoll(cells[0].first, nullptr, 10));
    parse_int_list(cells[1].first, cells[1].second, &out->seq1_values);
    out->seq1_offsets.push_back((int64_t)out->seq1_values.size());
    parse_int_list(cells[2].first, cells[2].second, &out->seq2_values);
    out->seq2_offsets.push_back((int64_t)out->seq2_values.size());
    out->domains.push_back((int32_t)strtol(cells[3].first, nullptr, 10));
    if (with_ob) {
      out->ob_labels.push_back((int32_t)strtol(cells[4].first, nullptr, 10));
    }
  }
  return out;
}

int64_t amid_num_rows(void* h) {
  return (int64_t)((AmidParsed*)h)->users.size();
}
int64_t amid_seq_total(void* h, int which) {
  auto* o = (AmidParsed*)h;
  return (int64_t)(which == 0 ? o->seq1_values.size() : o->seq2_values.size());
}
const int64_t* amid_users(void* h) { return ((AmidParsed*)h)->users.data(); }
const int32_t* amid_domains(void* h) { return ((AmidParsed*)h)->domains.data(); }
const int32_t* amid_ob_labels(void* h) {
  return ((AmidParsed*)h)->ob_labels.data();
}
const int64_t* amid_seq_offsets(void* h, int which) {
  auto* o = (AmidParsed*)h;
  return (which == 0 ? o->seq1_offsets : o->seq2_offsets).data();
}
const int64_t* amid_seq_values(void* h, int which) {
  auto* o = (AmidParsed*)h;
  return (which == 0 ? o->seq1_values : o->seq2_values).data();
}
void amid_free(void* h) { delete (AmidParsed*)h; }

// ---------------------------------------------------------------------------
// Full native pack: AmidParsed -> the dense arrays of
// amid_tpu.data.packed.PackedDualDomainDataset, with the exact semantics of
// pack_rows (dataset_seq.py:177-250 protocol): per-row target pop + dedupe,
// left-pad/truncate, sorted-unique per-domain pools (cyclically padded),
// reject sets as pool positions (sentinel-padded with p_width). The python
// pack loop costs ~375 ms on the 27k-row mybank split and the ctypes
// lists-of-lists reboxing another ~70 ms; this path returns ready arrays in
// ~10 ms (tools/bench_parser.py).

struct AmidPacked {
  int64_t n = 0;
  int32_t seq_len = 0, r_width = 0, p_width = 0;
  int32_t pool_sizes[2] = {0, 0};
  std::vector<int32_t> target, domain, overlap, ob, long1, long2, user;
  std::vector<int32_t> seq1, seq2;    // n * seq_len
  std::vector<int32_t> reject;        // n * r_width
  std::vector<int32_t> reject_counts; // n
  std::vector<int32_t> pools;         // 2 * p_width
};

static void pad_trunc(const std::vector<int32_t>& seq, int32_t seq_len,
                      int64_t pad_id, int32_t* out) {
  // seq_pad_trunc (dataset_seq.py:12-22): keep last min(len, L), left-pad.
  int64_t keep = std::min<int64_t>((int64_t)seq.size(), seq_len);
  int64_t pad = seq_len - keep;
  for (int64_t j = 0; j < pad; ++j) out[j] = (int32_t)pad_id;
  for (int64_t j = 0; j < keep; ++j)
    out[pad + j] = seq[seq.size() - keep + j];
}

void* amid_pack(void* handle, int seq_len, int64_t pad_id, int long_length) {
  auto* in = (AmidParsed*)handle;
  const int64_t n = (int64_t)in->users.size();
  auto* out = new AmidPacked();
  out->n = n;
  out->seq_len = seq_len;

  // per-domain sorted unique pools
  std::vector<int32_t> p[2];
  for (int d = 0; d < 2; ++d) {
    auto& vals = d == 0 ? in->seq1_values : in->seq2_values;
    p[d].assign(vals.begin(), vals.end());
    std::sort(p[d].begin(), p[d].end());
    p[d].erase(std::unique(p[d].begin(), p[d].end()), p[d].end());
    out->pool_sizes[d] = (int32_t)p[d].size();
  }
  out->p_width = std::max<int32_t>(
      1, std::max(out->pool_sizes[0], out->pool_sizes[1]));
  out->pools.assign(2 * (int64_t)out->p_width, 0);
  for (int d = 0; d < 2; ++d)
    for (int32_t j = 0; j < out->p_width; ++j)
      if (!p[d].empty()) out->pools[d * out->p_width + j] = p[d][j % p[d].size()];

  out->target.resize(n);
  out->domain.resize(n);
  out->overlap.resize(n);
  out->long1.resize(n);
  out->long2.resize(n);
  out->user.resize(n);
  out->ob.resize(n, 1);
  out->seq1.resize(n * (int64_t)seq_len);
  out->seq2.resize(n * (int64_t)seq_len);
  out->reject_counts.resize(n);

  std::vector<std::vector<int32_t>> rejects(n);
  int64_t r_width = 1;
  std::vector<int32_t> s1, s2;
  for (int64_t i = 0; i < n; ++i) {
    out->user[i] = (int32_t)in->users[i];
    const int32_t dom = in->domains[i];
    out->domain[i] = dom;
    if (!in->ob_labels.empty()) out->ob[i] = in->ob_labels[i];
    s1.assign(in->seq1_values.begin() + in->seq1_offsets[i],
              in->seq1_values.begin() + in->seq1_offsets[i + 1]);
    s2.assign(in->seq2_values.begin() + in->seq2_offsets[i],
              in->seq2_values.begin() + in->seq2_offsets[i + 1]);
    out->overlap[i] = (!s1.empty() && !s2.empty()) ? 1 : 0;
    auto& active = dom == 0 ? s1 : s2;
    if (active.empty()) { delete out; return nullptr; }
    // reject set = sorted unique of the FULL active seq incl. target
    // (dataset_seq.py:188 subtracts set(seq) pre-pop)
    auto& rej = rejects[i];
    rej = active;
    std::sort(rej.begin(), rej.end());
    rej.erase(std::unique(rej.begin(), rej.end()), rej.end());
    r_width = std::max<int64_t>(r_width, (int64_t)rej.size());
    out->reject_counts[i] = (int32_t)rej.size();
    // pop target, drop its other occurrences (dataset_seq.py:189-196)
    const int32_t tgt = active.back();
    active.pop_back();
    active.erase(std::remove(active.begin(), active.end(), tgt), active.end());
    out->target[i] = tgt;
    out->long1[i] = (int64_t)s1.size() >= long_length ? 1 : 0;
    out->long2[i] = (int64_t)s2.size() >= long_length ? 1 : 0;
    pad_trunc(s1, seq_len, pad_id, &out->seq1[i * seq_len]);
    pad_trunc(s2, seq_len, pad_id, &out->seq2[i * seq_len]);
  }
  out->r_width = (int32_t)r_width;
  out->reject.assign(n * r_width, out->p_width);  // sentinel = p_width
  for (int64_t i = 0; i < n; ++i) {
    const auto& pool = p[out->domain[i]];
    for (size_t j = 0; j < rejects[i].size(); ++j) {
      out->reject[i * r_width + (int64_t)j] = (int32_t)(
          std::lower_bound(pool.begin(), pool.end(), rejects[i][j]) -
          pool.begin());
    }
  }
  return out;
}

int64_t amid_packed_n(void* h) { return ((AmidPacked*)h)->n; }
int32_t amid_packed_r_width(void* h) { return ((AmidPacked*)h)->r_width; }
int32_t amid_packed_p_width(void* h) { return ((AmidPacked*)h)->p_width; }
int32_t amid_packed_pool_size(void* h, int d) {
  return ((AmidPacked*)h)->pool_sizes[d];
}
const int32_t* amid_packed_arr(void* h, const char* name) {
  auto* o = (AmidPacked*)h;
  if (!strcmp(name, "user")) return o->user.data();
  if (!strcmp(name, "target")) return o->target.data();
  if (!strcmp(name, "domain")) return o->domain.data();
  if (!strcmp(name, "overlap")) return o->overlap.data();
  if (!strcmp(name, "ob")) return o->ob.data();
  if (!strcmp(name, "long1")) return o->long1.data();
  if (!strcmp(name, "long2")) return o->long2.data();
  if (!strcmp(name, "seq1")) return o->seq1.data();
  if (!strcmp(name, "seq2")) return o->seq2.data();
  if (!strcmp(name, "reject")) return o->reject.data();
  if (!strcmp(name, "reject_counts")) return o->reject_counts.data();
  if (!strcmp(name, "pools")) return o->pools.data();
  return nullptr;
}
void amid_packed_free(void* h) { delete (AmidPacked*)h; }

}  // extern "C"
