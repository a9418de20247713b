// fastcsv — native parser for the TRW benchmark's binary 0/1 CSV files.
//
// The file format (verified across the benchmark suite) is strictly
//   <digit> ',' <digit> ',' ... <digit> '\n'
// with single-char 0/1 values, i.e. every row is exactly 2*n_var bytes.
// This parser mmaps the file and converts digits to bytes in parallel,
// writing straight into a caller-provided buffer (no intermediate copies —
// unlike the numpy fallback, which materializes the whole byte matrix
// before striding). Exposed to Python via ctypes (pgmvae_tpu/data/loader.py).
//
// Returns (via status code):
//   0  ok; *rows_out = number of rows parsed
//   1  cannot open/stat file
//   2  file size is not a whole number of rows (after tolerating a missing
//      trailing newline)
//   3  unexpected byte layout (non-digit value or missing separator) —
//      caller should fall back to a general CSV parser
//   4  more rows than max_rows

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// Parse rows [row0, row1) from the raw byte image into out.
// Returns false on layout violation.
bool parse_range(const unsigned char* base, int64_t n_var, int64_t row0,
                 int64_t row1, unsigned char* out) {
    const int64_t row_bytes = 2 * n_var;
    for (int64_t r = row0; r < row1; ++r) {
        const unsigned char* src = base + r * row_bytes;
        unsigned char* dst = out + r * n_var;
        for (int64_t j = 0; j < n_var; ++j) {
            unsigned char v = src[2 * j];
            unsigned char sep = src[2 * j + 1];
            unsigned char expect_sep = (j + 1 == n_var) ? '\n' : ',';
            if (v < '0' || v > '9' || sep != expect_sep) return false;
            dst[j] = v - '0';
        }
    }
    return true;
}

}  // namespace

extern "C" int fastcsv_parse(const char* path, int64_t n_var,
                             unsigned char* out, int64_t max_rows,
                             int64_t* rows_out) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return 1;
    struct stat st;
    if (fstat(fd, &st) != 0) { ::close(fd); return 1; }
    int64_t size = st.st_size;
    const int64_t row_bytes = 2 * n_var;
    if (size == 0 || row_bytes <= 0) { ::close(fd); return 2; }

    void* map = mmap(nullptr, static_cast<size_t>(size), PROT_READ,
                     MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (map == MAP_FAILED) return 1;
    const unsigned char* base = static_cast<const unsigned char*>(map);

    int64_t rem = size % row_bytes;
    int64_t rows = size / row_bytes;
    bool missing_newline = false;
    if (rem == row_bytes - 1) {  // tolerate missing trailing '\n'
        rows += 1;
        missing_newline = true;
    } else if (rem != 0) {
        munmap(map, static_cast<size_t>(size));
        return 2;
    }
    if (rows > max_rows) {
        munmap(map, static_cast<size_t>(size));
        return 4;
    }

    // Last row is parsed on the main thread if its newline is missing (its
    // final separator check differs); everything else fans out.
    int64_t par_rows = missing_newline ? rows - 1 : rows;
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    // thread-spawn costs ~ms; only fan out when there are several MB to do
    if (par_rows * row_bytes < (4 << 20)) n_threads = 1;

    std::vector<unsigned char> ok(n_threads, 1);
    {
        std::vector<std::thread> threads;
        int64_t chunk = (par_rows + n_threads - 1) / n_threads;
        for (unsigned t = 0; t < n_threads; ++t) {
            int64_t r0 = t * chunk;
            int64_t r1 = std::min<int64_t>(par_rows, r0 + chunk);
            if (r0 >= r1) { continue; }
            threads.emplace_back([=, &ok] {
                ok[t] = parse_range(base, n_var, r0, r1, out) ? 1 : 0;
            });
        }
        for (auto& th : threads) th.join();
    }
    bool all_ok = true;
    for (unsigned char o : ok) all_ok = all_ok && o;

    if (all_ok && missing_newline) {
        const unsigned char* src = base + (rows - 1) * row_bytes;
        unsigned char* dst = out + (rows - 1) * n_var;
        for (int64_t j = 0; j < n_var && all_ok; ++j) {
            unsigned char v = src[2 * j];
            if (v < '0' || v > '9') { all_ok = false; break; }
            if (j + 1 < n_var && src[2 * j + 1] != ',') { all_ok = false; break; }
            dst[j] = v - '0';
        }
    }

    munmap(map, static_cast<size_t>(size));
    if (!all_ok) return 3;
    *rows_out = rows;
    return 0;
}
