// Native IO runtime for of_dis_tpu: fast .flo/.pfm writers/readers, a PNG
// decoder (zlib inflate + unfilter), and a multithreaded batch image decoder
// that feeds the TPU input pipeline.
//
// The reference framework is pure native code (SURVEY.md §2); this module is
// the TPU build's native runtime counterpart for the IO path, replacing the
// reference's OpenCV imread + stdio writers (run_dense.cpp:17-129, 209-210).
// Python bindings use the CPython C API directly.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------- helpers

struct Buffer {
  std::vector<uint8_t> data;
};

static bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t rd = n ? std::fread(out->data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return rd == static_cast<size_t>(n);
}

// ------------------------------------------------------------- PNG decode

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;  // decoded channels (1, 3, or 4)
  std::vector<uint8_t> pixels;  // row-major, interleaved
  std::string error;
};

static uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8-bit non-interlaced PNG (color types 0 gray, 2 RGB, 4 gray+A,
// 6 RGBA). Returns false with .error set on unsupported features.
static bool decode_png(const std::vector<uint8_t>& file, Image* im) {
  static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (file.size() < 8 || std::memcmp(file.data(), magic, 8) != 0) {
    im->error = "not a PNG";
    return false;
  }
  size_t pos = 8;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= file.size()) {
    uint32_t len = be32(&file[pos]);
    const char* type = reinterpret_cast<const char*>(&file[pos + 4]);
    const uint8_t* payload = &file[pos + 8];
    if (pos + 12 + len > file.size()) break;
    if (!std::memcmp(type, "IHDR", 4)) {
      im->width = static_cast<int>(be32(payload));
      im->height = static_cast<int>(be32(payload + 4));
      bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (bit_depth != 8 || interlace != 0 ||
      (color_type != 0 && color_type != 2 && color_type != 4 &&
       color_type != 6)) {
    im->error = "unsupported PNG (need 8-bit non-interlaced gray/RGB/RGBA)";
    return false;
  }
  int nch = color_type == 0 ? 1 : color_type == 2 ? 3 : color_type == 4 ? 2 : 4;
  const size_t stride = static_cast<size_t>(im->width) * nch;
  std::vector<uint8_t> raw((stride + 1) * im->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    im->error = "zlib inflate failed";
    return false;
  }
  // unfilter
  im->pixels.assign(stride * im->height, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < im->height; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &im->pixels[stride * y];
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= static_cast<size_t>(nch) ? dst[x - nch] : 0;
      int b = prev[x];
      int c = x >= static_cast<size_t>(nch) ? prev[x - nch] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default:
          im->error = "bad PNG filter";
          return false;
      }
      dst[x] = static_cast<uint8_t>(v & 0xff);
    }
    std::memcpy(prev.data(), dst, stride);
  }
  im->channels = nch;
  return true;
}

// Decode PGM/PPM (binary P5/P6, maxval 255).
static bool decode_pnm(const std::vector<uint8_t>& file, Image* im) {
  if (file.size() < 2 || file[0] != 'P' || (file[1] != '5' && file[1] != '6')) {
    im->error = "not a binary PNM";
    return false;
  }
  int nch = file[1] == '5' ? 1 : 3;
  size_t pos = 2;
  int vals[3] = {0, 0, 0};
  for (int k = 0; k < 3; ++k) {
    // skip whitespace + comments
    while (pos < file.size() &&
           (isspace(file[pos]) || file[pos] == '#')) {
      if (file[pos] == '#')
        while (pos < file.size() && file[pos] != '\n') ++pos;
      else
        ++pos;
    }
    int v = 0;
    while (pos < file.size() && isdigit(file[pos]))
      v = v * 10 + (file[pos++] - '0');
    vals[k] = v;
  }
  ++pos;  // single whitespace after maxval
  im->width = vals[0];
  im->height = vals[1];
  if (vals[2] != 255) {
    im->error = "PNM maxval != 255 unsupported";
    return false;
  }
  size_t need = static_cast<size_t>(im->width) * im->height * nch;
  if (file.size() - pos < need) {
    im->error = "truncated PNM";
    return false;
  }
  im->pixels.assign(file.begin() + pos, file.begin() + pos + need);
  im->channels = nch;
  return true;
}

// Convert a decoded image to (C,H,W) in `out` with C=want_channels;
// T = float (classic) or uint8_t (the device-transfer format — gray values
// are u8-exact, so this skips the 4x f32 blow-up entirely).
// Gray conversion uses OpenCV's fixed-point BGR2GRAY weights so results are
// bit-identical to the cv::imread(GRAYSCALE) path the reference uses
// (run_dense.cpp:200-210). PNG pixel order is RGB(A); output color order is
// BGR for parity with cv::imread(COLOR).
template <typename T>
static void to_chw(const Image& im, int want_channels, T* out) {
  const int w = im.width, h = im.height, nch = im.channels;
  const size_t plane = static_cast<size_t>(w) * h;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = &im.pixels[static_cast<size_t>(y) * w * nch];
    for (int x = 0; x < w; ++x) {
      const uint8_t* px = row + static_cast<size_t>(x) * nch;
      int r, g, b;
      if (nch == 1 || nch == 2) {
        r = g = b = px[0];
      } else {
        r = px[0];
        g = px[1];
        b = px[2];
      }
      size_t i = static_cast<size_t>(y) * w + x;
      if (want_channels == 1) {
        // cv::cvtColor BGR2GRAY fixed point: (R*4899 + G*9617 + B*1868 +
        // 8192) >> 14
        int yv = (r * 4899 + g * 9617 + b * 1868 + 8192) >> 14;
        out[i] = static_cast<T>(yv);
      } else {
        out[0 * plane + i] = static_cast<T>(b);
        out[1 * plane + i] = static_cast<T>(g);
        out[2 * plane + i] = static_cast<T>(r);
      }
    }
  }
}

static void to_float_chw(const Image& im, int want_channels, float* out) {
  to_chw<float>(im, want_channels, out);
}

static bool decode_any(const char* path, Image* im) {
  std::vector<uint8_t> file;
  if (!read_file(path, &file)) {
    im->error = std::string("cannot read ") + path;
    return false;
  }
  if (file.size() >= 8 && file[0] == 137 && file[1] == 'P') {
    return decode_png(file, im);
  }
  if (file.size() >= 2 && file[0] == 'P') {
    return decode_pnm(file, im);
  }
  im->error = "unsupported image format (PNG/PGM/PPM supported natively)";
  return false;
}

// ------------------------------------------------------------ Python glue

// Minimal buffer-protocol helpers: we avoid the NumPy C API and exchange
// data via bytes + shape tuples; the Python wrapper turns them into arrays
// with zero extra copies on the read side (np.frombuffer).

static PyObject* py_write_flo(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer buf;
  int width, height, nc;
  if (!PyArg_ParseTuple(args, "sy*iii", &path, &buf, &width, &height, &nc))
    return nullptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) {
    PyBuffer_Release(&buf);
    PyErr_Format(PyExc_OSError, "cannot open %s", path);
    return nullptr;
  }
  std::fwrite("PIEH", 1, 4, f);
  int32_t wh[2] = {width, height};
  std::fwrite(wh, sizeof(int32_t), 2, f);
  std::fwrite(buf.buf, 1, static_cast<size_t>(buf.len), f);
  std::fclose(f);
  PyBuffer_Release(&buf);
  Py_RETURN_NONE;
}

static PyObject* py_read_flo(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::vector<uint8_t> file;
  if (!read_file(path, &file) || file.size() < 12 ||
      std::memcmp(file.data(), "PIEH", 4) != 0) {
    PyErr_Format(PyExc_ValueError, "bad .flo file %s", path);
    return nullptr;
  }
  int32_t w, h;
  std::memcpy(&w, &file[4], 4);
  std::memcpy(&h, &file[8], 4);
  PyObject* payload = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(&file[12]),
      static_cast<Py_ssize_t>(file.size() - 12));
  if (!payload) return nullptr;
  return Py_BuildValue("(iiN)", w, h, payload);
}

static PyObject* py_write_pfm(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer buf;  // float32 (H,W) row-major depth
  int width, height;
  if (!PyArg_ParseTuple(args, "sy*ii", &path, &buf, &width, &height))
    return nullptr;
  FILE* f = std::fopen(path, "wb");
  if (!f) {
    PyBuffer_Release(&buf);
    PyErr_Format(PyExc_OSError, "cannot open %s", path);
    return nullptr;
  }
  std::fprintf(f, "Pf\n%d %d\n%f\n", width, height, -1.0f);
  const float* data = static_cast<const float*>(buf.buf);
  std::vector<float> row(static_cast<size_t>(width));
  for (int y = height - 1; y >= 0; --y) {  // bottom-up, negated
    const float* src = data + static_cast<size_t>(y) * width;
    for (int x = 0; x < width; ++x) row[x] = -src[x];
    std::fwrite(row.data(), sizeof(float), static_cast<size_t>(width), f);
  }
  std::fclose(f);
  PyBuffer_Release(&buf);
  Py_RETURN_NONE;
}

static PyObject* py_decode_image(PyObject*, PyObject* args) {
  const char* path;
  int channels;
  if (!PyArg_ParseTuple(args, "si", &path, &channels)) return nullptr;
  Image im;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = decode_any(path, &im);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, im.error.c_str());
    return nullptr;
  }
  const size_t n = static_cast<size_t>(channels) * im.width * im.height;
  PyObject* payload = PyBytes_FromStringAndSize(nullptr,
                                                static_cast<Py_ssize_t>(n * 4));
  if (!payload) return nullptr;
  to_float_chw(im, channels,
               reinterpret_cast<float*>(PyBytes_AsString(payload)));
  return Py_BuildValue("(iiN)", im.width, im.height, payload);
}

// decode_batch(paths, channels, nthreads[, as_u8]) -> (w, h, bytes) where
// bytes is (B, C, H, W) float32, or uint8 when as_u8 is true (the device
// transfer format: 4x smaller, bit-exact for 8-bit sources). All images
// must share one size.
static PyObject* py_decode_batch(PyObject*, PyObject* args) {
  PyObject* list;
  int channels, nthreads, as_u8 = 0;
  if (!PyArg_ParseTuple(args, "Oii|p", &list, &channels, &nthreads, &as_u8))
    return nullptr;
  std::vector<std::string> paths;
  PyObject* seq = PySequence_Fast(list, "paths must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t nb = PySequence_Fast_GET_SIZE(seq);
  for (Py_ssize_t i = 0; i < nb; ++i) {
    PyObject* s = PySequence_Fast_GET_ITEM(seq, i);
    const char* c = PyUnicode_AsUTF8(s);
    if (!c) {
      Py_DECREF(seq);
      return nullptr;
    }
    paths.emplace_back(c);
  }
  Py_DECREF(seq);

  std::vector<Image> images(paths.size());
  std::vector<std::string> errors(paths.size());
  {
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::thread> pool;
    std::atomic<size_t> next{0};
    int nt = nthreads > 0 ? nthreads : 4;
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          size_t i = next.fetch_add(1);
          if (i >= paths.size()) return;
          if (!decode_any(paths[i].c_str(), &images[i]))
            errors[i] = images[i].error;
        }
      });
    }
    for (auto& th : pool) th.join();
    Py_END_ALLOW_THREADS;
  }
  for (size_t i = 0; i < errors.size(); ++i) {
    if (!errors[i].empty()) {
      PyErr_Format(PyExc_ValueError, "%s: %s", paths[i].c_str(),
                   errors[i].c_str());
      return nullptr;
    }
  }
  if (images.empty()) {
    PyErr_SetString(PyExc_ValueError, "empty batch");
    return nullptr;
  }
  int w = images[0].width, h = images[0].height;
  for (auto& im : images) {
    if (im.width != w || im.height != h) {
      PyErr_SetString(PyExc_ValueError, "batch images differ in size");
      return nullptr;
    }
  }
  const size_t per = static_cast<size_t>(channels) * w * h;
  const size_t esz = as_u8 ? 1 : 4;
  PyObject* payload = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(per * images.size() * esz));
  if (!payload) return nullptr;
  char* out = PyBytes_AsString(payload);
  {
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::thread> pool;
    std::atomic<size_t> next{0};
    int nt = nthreads > 0 ? nthreads : 4;
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          size_t i = next.fetch_add(1);
          if (i >= images.size()) return;
          if (as_u8) {
            to_chw<uint8_t>(images[i], channels,
                            reinterpret_cast<uint8_t*>(out) + per * i);
          } else {
            to_chw<float>(images[i], channels,
                          reinterpret_cast<float*>(out) + per * i);
          }
        }
      });
    }
    for (auto& th : pool) th.join();
    Py_END_ALLOW_THREADS;
  }
  return Py_BuildValue("(iiN)", w, h, payload);
}

static PyMethodDef methods[] = {
    {"write_flo_raw", py_write_flo, METH_VARARGS,
     "write_flo_raw(path, float32_bytes, width, height, nc)"},
    {"read_flo_raw", py_read_flo, METH_VARARGS,
     "read_flo_raw(path) -> (w, h, float32_bytes)"},
    {"write_pfm_raw", py_write_pfm, METH_VARARGS,
     "write_pfm_raw(path, float32_bytes_hw, width, height)"},
    {"decode_image", py_decode_image, METH_VARARGS,
     "decode_image(path, channels) -> (w, h, float32_chw_bytes)"},
    {"decode_batch", py_decode_batch, METH_VARARGS,
     "decode_batch(paths, channels, nthreads[, as_u8]) -> (w, h, "
     "bchw_bytes: float32, or uint8 when as_u8)"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native_io",
                                    "of_dis_tpu native IO runtime", -1,
                                    methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_io(void) { return PyModule_Create(&module); }
