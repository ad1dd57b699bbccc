// somvq_io — native data-file engine for som_lvq_pak_tpu.
//
// The reference package's data layer is ANSI C (datafile.c: line parser
// load_entry :552-748, writer write_entry :420-447); this is the
// TPU-framework's native equivalent: a single-pass parser that turns the
// text data/codebook format into dense arrays (the framework's Dataset
// layout) and a writer that formats them back, both exposed through a
// plain C ABI consumed via ctypes (no pybind11 in the image).
//
// Parity notes:
//   * component tokens parse as (float)strtod — the same double-rounded-
//     to-float value as the reference's `(float)atof` and NumPy's
//     float32(str)
//   * the writer emits "%g" per component with the reference's trailing-
//     space convention (write_entry, datafile.c:420-447)
//   * entries whose components are ALL masked are skipped when
//     skip_empty is set (datafile.c:676-696)
//   * weight= parses with atoi semantics (get_weight, datafile.c:912-915)
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

typedef struct {
  int64_t n;          // number of entries
  int32_t dim;
  int32_t topol;      // 0 unknown, 1 data, 2 lvq, 3 hexa, 4 rect
  int32_t neigh;      // 0 unknown, 1 bubble, 2 gaussian
  int32_t xdim, ydim;

  float*   points;    // n * dim
  uint8_t* mask;      // n * dim, NULL if nothing masked
  float*   weight;    // n, NULL if no weight= token seen
  int32_t* fixedpt;   // n * 2, NULL if no fixed= token seen

  // labels: every label token of every entry, '\0'-separated, in entry
  // order; labcnt[i] = number of labels of entry i
  char*    labstr;
  int64_t  labstr_len;
  int32_t* labcnt;
  int64_t  total_labels;

  // '\n'-joined '#' comment lines seen before the header
  char*    comments;
  int64_t  comments_len;

  char     error[256];
} svq_data;

static void svq_init(svq_data* d) { memset(d, 0, sizeof(*d)); }

void svq_free(svq_data* d) {
  free(d->points); free(d->mask); free(d->weight); free(d->fixedpt);
  free(d->labstr); free(d->labcnt); free(d->comments);
  svq_init(d);
}

static int is_sep(char c) { return c == ' ' || c == '\t' || c == '\r'; }

// tokenize one line in place; returns token count
static int split_line(char* line, std::vector<char*>& toks) {
  toks.clear();
  char* p = line;
  while (*p) {
    while (is_sep(*p)) ++p;
    if (!*p || *p == '\n') break;
    toks.push_back(p);
    while (*p && !is_sep(*p) && *p != '\n') ++p;
    if (*p) { *p = '\0'; ++p; }
  }
  return (int)toks.size();
}

static int topol_id(const char* s) {
  if (!strcmp(s, "data")) return 1;
  if (!strcmp(s, "lvq"))  return 2;
  if (!strcmp(s, "hexa")) return 3;
  if (!strcmp(s, "rect")) return 4;
  return 0;
}

static int neigh_id(const char* s) {
  if (!strcmp(s, "bubble"))   return 1;
  if (!strcmp(s, "gaussian")) return 2;
  return 0;
}

// parse a '\n'-separated text buffer (caller owns `buf`; it is modified
// in place during tokenization)
int svq_parse_buffer(char* buf, int64_t len, const char* mask_str,
                     int skip_empty, svq_data* out) {
  svq_init(out);
  (void)len;

  std::vector<float>   points;
  std::vector<uint8_t> mask;
  std::vector<float>   weight;
  std::vector<int32_t> fixedpt;
  std::vector<int32_t> labcnt;
  std::string          labstr;
  std::string          comments;
  bool any_mask = false, any_weight = false, any_fixed = false;
  int64_t total_labels = 0;

  std::vector<char*> toks;
  int dim = -1;

  char* save = nullptr;
  for (char* line = strtok_r(buf, "\n", &save); line;
       line = strtok_r(nullptr, "\n", &save)) {
    if (line[0] == '#') {
      if (dim < 0) {  // header comments only (read_data keeps those)
        if (!comments.empty()) comments += '\n';
        comments += line;
      }
      continue;
    }
    if (dim < 0) {
      // header line: dim [topol [xdim ydim neigh]]
      int nt = split_line(line, toks);
      if (nt == 0) continue;  // blank before header
      dim = atoi(toks[0]);
      if (dim <= 0) {
        snprintf(out->error, sizeof(out->error), "bad header dimension");
        return 1;
      }
      out->dim = dim;
      if (nt > 1) out->topol = topol_id(toks[1]);
      if (nt > 2) out->xdim = atoi(toks[2]);
      if (nt > 3) out->ydim = atoi(toks[3]);
      if (nt > 4) out->neigh = neigh_id(toks[4]);
      continue;
    }
    int nt = split_line(line, toks);
    if (nt == 0) continue;
    if (nt < dim) {
      snprintf(out->error, sizeof(out->error),
               "short line: %d tokens, dim %d", nt, dim);
      return 1;
    }
    size_t row0 = points.size();
    points.resize(row0 + dim, 0.0f);
    mask.resize(row0 + dim, 0);
    int nmasked = 0;
    for (int i = 0; i < dim; ++i) {
      if (!strcmp(toks[i], mask_str)) {
        mask[row0 + i] = 1;
        ++nmasked;
        any_mask = true;
      } else {
        points[row0 + i] = (float)strtod(toks[i], nullptr);
      }
    }
    if (nmasked == dim && skip_empty) {  // datafile.c:676-686
      points.resize(row0);
      mask.resize(row0);
      continue;
    }
    float w = 0.0f;  // no weight= token => 0 sentinel (datafile.c:497)
    int32_t fx = -1, fy = -1;
    int nlabs = 0;
    for (int i = dim; i < nt; ++i) {
      if (!strncmp(toks[i], "weight=", 7)) {
        w = (float)atoi(toks[i] + 7);  // get_weight is atoi
        any_weight = true;
      } else if (!strncmp(toks[i], "fixed=", 6)) {
        char* comma = strchr(toks[i] + 6, ',');
        fx = atoi(toks[i] + 6);
        fy = comma ? atoi(comma + 1) : 0;
        any_fixed = true;
      } else {
        labstr.append(toks[i]);
        labstr.push_back('\0');
        ++nlabs;
      }
    }
    weight.push_back(w);
    fixedpt.push_back(fx);
    fixedpt.push_back(fy);
    labcnt.push_back(nlabs);
    total_labels += nlabs;
  }

  if (dim < 0) {
    snprintf(out->error, sizeof(out->error), "no header line");
    return 1;
  }

  int64_t n = (int64_t)labcnt.size();
  out->n = n;
  out->points = (float*)malloc(sizeof(float) * n * dim);
  memcpy(out->points, points.data(), sizeof(float) * n * dim);
  if (any_mask) {
    out->mask = (uint8_t*)malloc(n * dim);
    memcpy(out->mask, mask.data(), n * dim);
  }
  if (any_weight) {
    out->weight = (float*)malloc(sizeof(float) * n);
    memcpy(out->weight, weight.data(), sizeof(float) * n);
  }
  if (any_fixed) {
    out->fixedpt = (int32_t*)malloc(sizeof(int32_t) * n * 2);
    memcpy(out->fixedpt, fixedpt.data(), sizeof(int32_t) * n * 2);
  }
  out->labcnt = (int32_t*)malloc(sizeof(int32_t) * n);
  memcpy(out->labcnt, labcnt.data(), sizeof(int32_t) * n);
  out->total_labels = total_labels;
  out->labstr_len = (int64_t)labstr.size();
  out->labstr = (char*)malloc(labstr.size() + 1);
  memcpy(out->labstr, labstr.data(), labstr.size());
  out->labstr[labstr.size()] = '\0';
  out->comments_len = (int64_t)comments.size();
  out->comments = (char*)malloc(comments.size() + 1);
  memcpy(out->comments, comments.data(), comments.size());
  out->comments[comments.size()] = '\0';
  return 0;
}

int svq_parse_file(const char* path, const char* mask_str, int skip_empty,
                   svq_data* out) {
  svq_init(out);
  FILE* f = fopen(path, "rb");
  if (!f) {
    snprintf(out->error, sizeof(out->error), "cannot open %s", path);
    return 1;
  }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc(sz + 1);
  size_t rd = fread(buf, 1, sz, f);
  fclose(f);
  buf[rd] = '\0';
  int rc = svq_parse_buffer(buf, (int64_t)rd, mask_str, skip_empty, out);
  free(buf);
  return rc;
}

// ---------------------------------------------------------------------
// Writer: format entries back to text (write_entry, datafile.c:420-447).
// labels arrive as a '\0'-separated token stream + per-entry counts, so
// the intern table stays on the Python side.
// Returns a malloc'd buffer (caller frees with svq_free_text).
// ---------------------------------------------------------------------

char* svq_format_entries(const float* points, const uint8_t* mask,
                         const char* labstr, const int32_t* labcnt,
                         int64_t n, int32_t dim, const char* mask_str,
                         int64_t* out_len) {
  std::string out;
  out.reserve((size_t)n * dim * 8);
  char tmp[64];
  const char* lp = labstr;
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t d = 0; d < dim; ++d) {
      if (mask && mask[i * dim + d]) {
        out += mask_str;
      } else {
        snprintf(tmp, sizeof(tmp), "%g", (double)points[i * dim + d]);
        out += tmp;
      }
      out += ' ';
    }
    if (labcnt) {
      for (int32_t k = 0; k < labcnt[i]; ++k) {
        out += lp;
        out += ' ';
        lp += strlen(lp) + 1;
      }
    }
    out += '\n';
  }
  *out_len = (int64_t)out.size();
  char* ret = (char*)malloc(out.size() + 1);
  memcpy(ret, out.data(), out.size());
  ret[out.size()] = '\0';
  return ret;
}

void svq_free_text(char* p) { free(p); }

}  // extern "C"
