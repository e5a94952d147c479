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

}  // extern "C"
