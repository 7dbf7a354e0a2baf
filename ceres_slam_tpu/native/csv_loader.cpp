// Fast numeric-CSV loader for the dataset layer.
//
// Native counterpart of the reference's C++ CSVReader
// (/root/reference/include/ceres_slam/utils/csv_reader.hpp) in this
// framework's runtime: the TPU compute path is XLA, but bulk file parsing
// (KITTI-scale tracks run to hundreds of thousands of rows) stays native.
// Exposed through a minimal C ABI consumed via ctypes — no pybind11
// dependency.
//
// Build: make -C ceres_slam_tpu/native    (g++ -O3 -shared -fPIC)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct CsvData {
    std::vector<double> values;
    std::vector<long> offsets;  // row j spans values[offsets[j] .. offsets[j+1])
};

}  // namespace

extern "C" {

// Parse `path`; returns an opaque handle (nullptr on failure) and writes
// the row/value counts. Blank lines are skipped; tokens are parsed with
// strtod (non-numeric garbage parses as 0 like the reference's stod-based
// reader would throw — callers validate shapes downstream).
void* csv_load(const char* path, long* n_rows, long* n_values) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(static_cast<size_t>(size) + 1);
    size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
    std::fclose(f);
    buf[got] = '\0';

    auto* data = new CsvData();
    data->values.reserve(got / 8);
    data->offsets.push_back(0);

    char* p = buf.data();
    char* end = buf.data() + got;
    while (p < end) {
        // skip leading whitespace / empty lines
        while (p < end && (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t'))
            ++p;
        if (p >= end) break;
        // one row
        while (p < end && *p != '\n' && *p != '\r') {
            char* next = p;
            double v = std::strtod(p, &next);
            data->values.push_back(v);
            p = (next == p) ? p + 1 : next;  // always make progress
            while (p < end && (*p == ',' || *p == ' ' || *p == '\t')) ++p;
        }
        data->offsets.push_back(static_cast<long>(data->values.size()));
    }

    *n_rows = static_cast<long>(data->offsets.size()) - 1;
    *n_values = static_cast<long>(data->values.size());
    return data;
}

const double* csv_values(void* h) {
    return static_cast<CsvData*>(h)->values.data();
}

const long* csv_offsets(void* h) {
    return static_cast<CsvData*>(h)->offsets.data();
}

void csv_free(void* h) { delete static_cast<CsvData*>(h); }

}  // extern "C"
