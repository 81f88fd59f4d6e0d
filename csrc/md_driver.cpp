// allegro_md — native MD driver executing .atpu artifacts via the PJRT C API.
//
// The fully-native runtime role of pair_allegro (reference README.md:43-45,
// docs/guide/lammps.md): a C++ binary that loads a compiled model artifact
// (StableHLO + params, produced by `allegro-tpu compile`), drives it through
// any PJRT plugin (libaxon_pjrt.so / libtpu.so / a CPU plugin), and runs
// velocity-Verlet MD with skin-based re-neighboring — no Python anywhere in
// the loop.
//
//   allegro_md --artifact model.atpu --plugin /path/to/pjrt_plugin.so \
//              --init system.npz --steps 200 --dt 0.001 [--skin 0.5] \
//              [--out-prefix traj_] [--option key=value]...
//
//   system.npz: positions [N,3] f8, types [N] i4, masses [N] f8,
//               optional velocities [N,3] f8, optional cell [3,3] f8 (rows
//               are lattice vectors) + pbc [3] i4/b1 for periodic systems.
//   Artifact contract (meta.json): inputs (params..., positions[Na,3]f4,
//   edge_index[2,Ne]i4, atom_types[Na]i4, node_mask[Na]b1, edge_mask[Ne]b1),
//   outputs (atomic_energy, forces, total_energy).
//
//   Periodic boundaries run through the ghost-atom conversion (the LAMMPS /
//   pair_allegro data contract, reference allegro/_compile.py:28-63, mirrored
//   from compile/targets.py): at every re-neighboring, each distinct
//   (neighbor, nonzero cell shift) pair becomes a ghost row appended after
//   the N real atoms (owner's type, node_mask=1 so the model emits its
//   force); edges are rewired to the ghosts. Every step the ghost positions
//   are refreshed as pos[owner] + shift·cell, and ghost forces are collapsed
//   back onto their owners. The reported energy is the per-atom energy
//   summed over REAL rows only (ghost rows carry a spurious per-type shift
//   constant by construction).
//
//   --selftest runs the artifact/npz parsing and the integrator against an
//   analytic harmonic force field (no PJRT needed) — the CI-testable part.
//
// Build (see allegro_tpu/native/md_driver.py):
//   g++ -O3 -std=c++17 md_driver.cpp neighborlist_lib.cpp -ldl -o allegro_md

#include <dlfcn.h>

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <numeric>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

// from neighborlist.cpp (same translation-unit-free C interface the Python
// ctypes binding uses)
extern "C" long long atpu_neighbor_list(const double* pos_in, long long n,
                                        const double* cell_in, const int* pbc,
                                        double r_max, long long cap, int* out_i,
                                        int* out_j, double* out_shift);

namespace {

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "allegro_md: %s\n", msg.c_str());
  std::exit(1);
}

// ---------------------------------------------------------------------------
// minimal ZIP reader (stored entries only — exactly what zipfile.writestr and
// np.savez emit by default)
// ---------------------------------------------------------------------------

struct ZipEntry {
  std::string name;
  std::vector<uint8_t> data;
};

uint32_t rd32(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
         uint32_t(p[3]) << 24;
}
uint16_t rd16(const uint8_t* p) { return uint16_t(p[0]) | uint16_t(p[1]) << 8; }

std::vector<ZipEntry> read_zip(const std::vector<uint8_t>& buf) {
  std::vector<ZipEntry> out;
  size_t pos = 0;
  while (pos + 30 <= buf.size()) {
    if (rd32(&buf[pos]) != 0x04034b50u) break;  // local file header magic
    uint16_t method = rd16(&buf[pos + 8]);
    uint64_t comp_size = rd32(&buf[pos + 18]);
    uint64_t uncomp_size = rd32(&buf[pos + 22]);
    uint16_t name_len = rd16(&buf[pos + 26]);
    uint16_t extra_len = rd16(&buf[pos + 28]);
    uint16_t flags = rd16(&buf[pos + 6]);
    std::string name(reinterpret_cast<const char*>(&buf[pos + 30]), name_len);
    // zip64 (np.savez uses force_zip64): 32-bit sizes are 0xFFFFFFFF and the
    // real ones live in extra-field record 0x0001 (uncomp then comp, 8B each)
    if (comp_size == 0xFFFFFFFFu || uncomp_size == 0xFFFFFFFFu) {
      size_t ep = pos + 30 + name_len, eend = ep + extra_len;
      while (ep + 4 <= eend) {
        uint16_t hid = rd16(&buf[ep]), hsz = rd16(&buf[ep + 2]);
        if (hid == 0x0001 && ep + 4 + hsz <= eend) {
          const uint8_t* f = &buf[ep + 4];
          if (uncomp_size == 0xFFFFFFFFu && hsz >= 8) {
            uncomp_size = uint64_t(rd32(f)) | uint64_t(rd32(f + 4)) << 32;
            f += 8;
          }
          if (comp_size == 0xFFFFFFFFu && hsz >= 16) {
            comp_size = uint64_t(rd32(f)) | uint64_t(rd32(f + 4)) << 32;
          }
          break;
        }
        ep += 4 + hsz;
      }
      if (comp_size == 0xFFFFFFFFu) comp_size = uncomp_size;  // stored entries
    }
    size_t data_off = pos + 30 + name_len + extra_len;
    if (flags & 0x8) die("zip: streaming data descriptors unsupported: " + name);
    if (method != 0)
      die("zip: compressed entry (method " + std::to_string(method) +
          ") unsupported: " + name + " — .atpu entries are stored");
    if (data_off + comp_size > buf.size()) die("zip: truncated entry " + name);
    ZipEntry e;
    e.name = name;
    e.data.assign(buf.begin() + data_off, buf.begin() + data_off + comp_size);
    (void)uncomp_size;
    out.push_back(std::move(e));
    pos = data_off + comp_size;
  }
  if (out.empty()) die("zip: no entries (bad magic?)");
  return out;
}

std::vector<uint8_t> read_file(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) die("cannot open " + path);
  return std::vector<uint8_t>((std::istreambuf_iterator<char>(f)),
                              std::istreambuf_iterator<char>());
}

const ZipEntry* find_entry(const std::vector<ZipEntry>& zip,
                           const std::string& name) {
  for (const auto& e : zip)
    if (e.name == name) return &e;
  return nullptr;
}

// ---------------------------------------------------------------------------
// minimal NPY parser / writer
// ---------------------------------------------------------------------------

struct NpyArray {
  std::string descr;            // e.g. "<f4"
  std::vector<int64_t> shape;
  std::vector<uint8_t> data;
  size_t itemsize() const {
    if (descr.size() < 3) return 1;
    return size_t(std::atoi(descr.c_str() + 2));
  }
  int64_t numel() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

NpyArray parse_npy(const std::vector<uint8_t>& buf) {
  if (buf.size() < 10 || std::memcmp(buf.data(), "\x93NUMPY", 6) != 0)
    die("npy: bad magic");
  uint8_t major = buf[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = rd16(&buf[8]);
    hoff = 10;
  } else {
    hlen = rd32(&buf[8]);
    hoff = 12;
  }
  std::string hdr(reinterpret_cast<const char*>(&buf[hoff]), hlen);
  NpyArray a;
  auto dpos = hdr.find("'descr'");
  auto q1 = hdr.find('\'', dpos + 7);
  auto q2 = hdr.find('\'', q1 + 1);
  a.descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (hdr.find("'fortran_order': True") != std::string::npos)
    die("npy: fortran order unsupported");
  auto spos = hdr.find("'shape'");
  auto p1 = hdr.find('(', spos);
  auto p2 = hdr.find(')', p1);
  std::string shp = hdr.substr(p1 + 1, p2 - p1 - 1);
  size_t i = 0;
  while (i < shp.size()) {
    while (i < shp.size() && !isdigit(shp[i])) i++;
    if (i >= shp.size()) break;
    a.shape.push_back(std::atoll(shp.c_str() + i));
    while (i < shp.size() && isdigit(shp[i])) i++;
  }
  a.data.assign(buf.begin() + hoff + hlen, buf.end());
  return a;
}

void write_npy(const std::string& path, const void* data,
               const std::vector<int64_t>& shape, const std::string& descr) {
  std::string shp = "(";
  for (size_t i = 0; i < shape.size(); ++i)
    shp += std::to_string(shape[i]) + (shape.size() == 1 || i + 1 < shape.size() ? "," : "");
  shp += ")";
  std::string hdr = "{'descr': '" + descr + "', 'fortran_order': False, 'shape': " + shp + ", }";
  size_t total = 10 + hdr.size() + 1;
  size_t pad = (64 - total % 64) % 64;
  hdr += std::string(pad, ' ');
  hdr += '\n';
  std::ofstream f(path, std::ios::binary);
  f.write("\x93NUMPY\x01\x00", 8);
  uint16_t hl = uint16_t(hdr.size());
  f.put(char(hl & 0xff));
  f.put(char(hl >> 8));
  f.write(hdr.data(), hdr.size());
  int64_t n = 1;
  for (auto d : shape) n *= d;
  size_t isz = size_t(std::atoi(descr.c_str() + 2));
  f.write(reinterpret_cast<const char*>(data), n * isz);
}

std::map<std::string, NpyArray> parse_npz(const std::vector<uint8_t>& buf) {
  std::map<std::string, NpyArray> out;
  for (auto& e : read_zip(buf)) {
    std::string key = e.name;
    if (key.size() > 4 && key.substr(key.size() - 4) == ".npy")
      key = key.substr(0, key.size() - 4);
    out[key] = parse_npy(e.data);
  }
  return out;
}

// ---------------------------------------------------------------------------
// tiny JSON field extraction (for our own meta.json — known structure)
// ---------------------------------------------------------------------------

int64_t json_int(const std::string& s, const std::string& key) {
  auto p = s.find("\"" + key + "\"");
  if (p == std::string::npos) die("meta.json: missing " + key);
  p = s.find(':', p);
  return std::atoll(s.c_str() + p + 1);
}

// number of strings in a flat JSON array field, e.g. "outputs": ["a", "b"]
int64_t json_list_len(const std::string& s, const std::string& key) {
  auto p = s.find("\"" + key + "\"");
  if (p == std::string::npos) die("meta.json: missing " + key);
  auto lb = s.find('[', p);
  auto rb = s.find(']', lb);
  if (lb == std::string::npos || rb == std::string::npos)
    die("meta.json: bad list " + key);
  int64_t count = 0;
  for (size_t i = lb; i < rb; ++i)
    if (s[i] == '"') count++;
  return count / 2;
}

// ---------------------------------------------------------------------------
// PJRT C API wrapper
// ---------------------------------------------------------------------------

struct Pjrt {
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;

  void check(PJRT_Error* err, const char* what) const {
    if (!err) return;
    PJRT_Error_Message_Args m;
    std::memset(&m, 0, sizeof(m));
    m.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
    m.error = err;
    api->PJRT_Error_Message(&m);
    std::string msg(m.message, m.message_size);
    PJRT_Error_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
    d.error = err;
    api->PJRT_Error_Destroy(&d);
    die(std::string(what) + ": " + msg);
  }

  void init(const std::string& plugin,
            const std::vector<std::pair<std::string, std::string>>& opts) {
    void* h = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
    if (!h) die(std::string("dlopen failed: ") + dlerror());
    auto get = reinterpret_cast<const PJRT_Api* (*)()>(dlsym(h, "GetPjrtApi"));
    if (!get) die("plugin has no GetPjrtApi symbol");
    api = get();
    std::fprintf(stderr, "allegro_md: PJRT api version %d.%d\n",
                 api->pjrt_api_version.major_version,
                 api->pjrt_api_version.minor_version);
    {
      PJRT_Plugin_Initialize_Args a;
      std::memset(&a, 0, sizeof(a));
      a.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
      check(api->PJRT_Plugin_Initialize(&a), "PJRT_Plugin_Initialize");
    }
    // build named options (int64 when the value is all digits, else string)
    std::vector<PJRT_NamedValue> nv(opts.size());
    std::vector<int64_t> ints(opts.size());
    for (size_t i = 0; i < opts.size(); ++i) {
      std::memset(&nv[i], 0, sizeof(PJRT_NamedValue));
      nv[i].struct_size = PJRT_NamedValue_STRUCT_SIZE;
      nv[i].name = opts[i].first.c_str();
      nv[i].name_size = opts[i].first.size();
      const std::string& v = opts[i].second;
      bool is_int = !v.empty() && v.find_first_not_of("0123456789-") == std::string::npos;
      if (is_int) {
        ints[i] = std::atoll(v.c_str());
        nv[i].type = PJRT_NamedValue_kInt64;
        nv[i].int64_value = ints[i];
        nv[i].value_size = 1;
      } else {
        nv[i].type = PJRT_NamedValue_kString;
        nv[i].string_value = v.c_str();
        nv[i].value_size = v.size();
      }
    }
    PJRT_Client_Create_Args c;
    std::memset(&c, 0, sizeof(c));
    c.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    c.create_options = nv.data();
    c.num_options = nv.size();
    check(api->PJRT_Client_Create(&c), "PJRT_Client_Create");
    client = c.client;
    PJRT_Client_AddressableDevices_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    d.client = client;
    check(api->PJRT_Client_AddressableDevices(&d), "AddressableDevices");
    if (d.num_addressable_devices == 0) die("no addressable devices");
    device = d.addressable_devices[0];
  }

  PJRT_LoadedExecutable* compile(const std::vector<uint8_t>& mlir,
                                 const std::vector<uint8_t>& copts) {
    PJRT_Program prog;
    std::memset(&prog, 0, sizeof(prog));
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = const_cast<char*>(reinterpret_cast<const char*>(mlir.data()));
    prog.code_size = mlir.size();
    static const char kFmt[] = "mlir";
    prog.format = kFmt;
    prog.format_size = 4;
    PJRT_Client_Compile_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    a.client = client;
    a.program = &prog;
    a.compile_options = reinterpret_cast<const char*>(copts.data());
    a.compile_options_size = copts.size();
    check(api->PJRT_Client_Compile(&a), "PJRT_Client_Compile");
    return a.executable;
  }

  void await(PJRT_Event* ev, const char* what) {
    if (!ev) return;
    PJRT_Event_Await_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
    a.event = ev;
    check(api->PJRT_Event_Await(&a), what);
    PJRT_Event_Destroy_Args d;
    std::memset(&d, 0, sizeof(d));
    d.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
    d.event = ev;
    api->PJRT_Event_Destroy(&d);
  }

  PJRT_Buffer* to_device(const void* data, PJRT_Buffer_Type type,
                         const std::vector<int64_t>& dims) {
    PJRT_Client_BufferFromHostBuffer_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    a.client = client;
    a.data = data;
    a.type = type;
    a.dims = dims.data();
    a.num_dims = dims.size();
    a.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    a.device = device;
    check(api->PJRT_Client_BufferFromHostBuffer(&a), "BufferFromHostBuffer");
    await(a.done_with_host_buffer, "done_with_host_buffer");
    return a.buffer;
  }

  void to_host(PJRT_Buffer* buf, void* dst, size_t dst_size, int rank = 0) {
    PJRT_Buffer_ToHostBuffer_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
    a.src = buf;
    a.dst = dst;
    a.dst_size = dst_size;
    // without an explicit host_layout the copy uses the DEVICE layout — on
    // TPU e.g. forces [Na,3] come back minor-to-major {0,1} (transposed).
    // Request dense row-major explicitly for rank >= 2.
    PJRT_Buffer_MemoryLayout layout;
    std::vector<int64_t> m2m(rank);
    if (rank >= 2) {
      for (int i = 0; i < rank; ++i) m2m[i] = rank - 1 - i;
      std::memset(&layout, 0, sizeof(layout));
      layout.struct_size = PJRT_Buffer_MemoryLayout_STRUCT_SIZE;
      layout.type = PJRT_Buffer_MemoryLayout_Type_Tiled;
      layout.tiled.struct_size = PJRT_Buffer_MemoryLayout_Tiled_STRUCT_SIZE;
      layout.tiled.minor_to_major = m2m.data();
      layout.tiled.minor_to_major_size = rank;
      a.host_layout = &layout;
    }
    check(api->PJRT_Buffer_ToHostBuffer(&a), "ToHostBuffer");
    await(a.event, "ToHostBuffer event");
  }

  void destroy(PJRT_Buffer* b) {
    if (!b) return;
    PJRT_Buffer_Destroy_Args a;
    std::memset(&a, 0, sizeof(a));
    a.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    a.buffer = b;
    check(api->PJRT_Buffer_Destroy(&a), "Buffer_Destroy");
  }
};

// ---------------------------------------------------------------------------
// MD system + integrator
// ---------------------------------------------------------------------------

struct System {
  int64_t n = 0;
  std::vector<double> pos;    // [N,3]
  std::vector<double> vel;    // [N,3]
  std::vector<double> mass;   // [N]
  std::vector<int32_t> types; // [N]
  double cell[9] = {0, 0, 0, 0, 0, 0, 0, 0, 0};  // rows = lattice vectors
  int pbc[3] = {0, 0, 0};
  bool periodic = false;
};

// 3x3 inverse (rows are lattice vectors); false on singular
bool invert3x3(const double* a, double* inv) {
  double det = a[0] * (a[4] * a[8] - a[5] * a[7]) -
               a[1] * (a[3] * a[8] - a[5] * a[6]) +
               a[2] * (a[3] * a[7] - a[4] * a[6]);
  if (std::fabs(det) < 1e-300) return false;
  double id = 1.0 / det;
  inv[0] = (a[4] * a[8] - a[5] * a[7]) * id;
  inv[1] = (a[2] * a[7] - a[1] * a[8]) * id;
  inv[2] = (a[1] * a[5] - a[2] * a[4]) * id;
  inv[3] = (a[5] * a[6] - a[3] * a[8]) * id;
  inv[4] = (a[0] * a[8] - a[2] * a[6]) * id;
  inv[5] = (a[2] * a[3] - a[0] * a[5]) * id;
  inv[6] = (a[3] * a[7] - a[4] * a[6]) * id;
  inv[7] = (a[1] * a[6] - a[0] * a[7]) * id;
  inv[8] = (a[0] * a[4] - a[1] * a[3]) * id;
  return true;
}

// wrap positions into the cell along periodic axes (re-neighboring time
// only — mirrors the Python Simulation's rebuild-time wrap)
void wrap_positions(System& s) {
  if (!s.periodic) return;
  double inv[9];
  if (!invert3x3(s.cell, inv)) die("singular cell");
  for (int64_t a = 0; a < s.n; ++a) {
    double f[3];
    for (int k = 0; k < 3; ++k)
      f[k] = s.pos[3 * a + 0] * inv[0 + k] + s.pos[3 * a + 1] * inv[3 + k] +
             s.pos[3 * a + 2] * inv[6 + k];
    for (int k = 0; k < 3; ++k)
      if (s.pbc[k]) f[k] -= std::floor(f[k]);
    for (int k = 0; k < 3; ++k)
      s.pos[3 * a + k] = f[0] * s.cell[0 + k] + f[1] * s.cell[3 + k] +
                         f[2] * s.cell[6 + k];
  }
}

System load_system(const std::string& path) {
  auto npz = parse_npz(read_file(path));
  System s;
  auto& p = npz.at("positions");
  if (p.descr != "<f8") die("init: positions must be float64");
  s.n = p.shape[0];
  s.pos.assign(reinterpret_cast<const double*>(p.data.data()),
               reinterpret_cast<const double*>(p.data.data()) + 3 * s.n);
  auto& t = npz.at("types");
  s.types.assign(reinterpret_cast<const int32_t*>(t.data.data()),
                 reinterpret_cast<const int32_t*>(t.data.data()) + s.n);
  auto& m = npz.at("masses");
  s.mass.assign(reinterpret_cast<const double*>(m.data.data()),
                reinterpret_cast<const double*>(m.data.data()) + s.n);
  if (npz.count("velocities")) {
    auto& v = npz.at("velocities");
    s.vel.assign(reinterpret_cast<const double*>(v.data.data()),
                 reinterpret_cast<const double*>(v.data.data()) + 3 * s.n);
  } else {
    s.vel.assign(3 * s.n, 0.0);
  }
  if (npz.count("cell")) {
    auto& c = npz.at("cell");
    if (c.descr != "<f8" || c.numel() != 9) die("init: cell must be [3,3] f8");
    std::memcpy(s.cell, c.data.data(), sizeof(s.cell));
    if (npz.count("pbc")) {
      auto& p3 = npz.at("pbc");
      for (int k = 0; k < 3; ++k) {
        if (p3.descr == "<i4")
          s.pbc[k] = reinterpret_cast<const int32_t*>(p3.data.data())[k] != 0;
        else if (p3.descr == "<i8")
          s.pbc[k] = reinterpret_cast<const int64_t*>(p3.data.data())[k] != 0;
        else if (p3.descr == "|b1")
          s.pbc[k] = p3.data[k] != 0;
        else
          die("init: pbc must be i4/i8/b1");
      }
    } else {
      s.pbc[0] = s.pbc[1] = s.pbc[2] = 1;
    }
    s.periodic = s.pbc[0] || s.pbc[1] || s.pbc[2];
  }
  return s;
}

// center-sorted neighbor list with sentinel padding into fixed [2, n_edges]
struct EdgeSet {
  std::vector<int32_t> eidx;      // [2 * n_edges_pad]
  std::vector<uint8_t> edge_mask; // [n_edges_pad]
  int64_t n_real = 0;
};

// ghost atoms appended after the N real rows (periodic systems): the
// ghost-atom data contract of compile/targets.py `ghost_atom_conversion`
// (reference allegro/_compile.py:28-63)
struct GhostSet {
  std::vector<int32_t> owner;      // [G] owning real atom
  std::vector<double> shift_cart;  // [G*3] shift @ cell (Cartesian)
};

EdgeSet build_edges(const System& s, double r_max, int64_t n_edges_pad,
                    int64_t sentinel, GhostSet& ghosts) {
  double open_cell[9] = {1e6, 0, 0, 0, 1e6, 0, 0, 0, 1e6};
  int open_pbc[3] = {0, 0, 0};
  const double* cell = s.periodic ? s.cell : open_cell;
  const int* pbc = s.periodic ? s.pbc : open_pbc;
  int64_t cap = n_edges_pad;
  std::vector<int> oi(cap), oj(cap);
  std::vector<double> oshift(3 * cap);
  long long ne = atpu_neighbor_list(s.pos.data(), s.n, cell, pbc, r_max, cap,
                                    oi.data(), oj.data(), oshift.data());
  if (ne < 0) {
    if (-ne > n_edges_pad)
      die("edge overflow: need " + std::to_string(-ne) + " > artifact n_edges " +
          std::to_string(n_edges_pad));
    die("neighbor list error");
  }
  // ghost conversion: every distinct (neighbor, nonzero integer shift) pair
  // becomes one ghost row; edges are rewired to the ghosts
  ghosts.owner.clear();
  ghosts.shift_cart.clear();
  std::vector<int32_t> newj(ne);
  if (s.periodic) {
    std::map<std::array<int64_t, 4>, int32_t> gmap;
    for (int64_t k = 0; k < ne; ++k) {
      int64_t sx = llround(oshift[3 * k]), sy = llround(oshift[3 * k + 1]),
              sz = llround(oshift[3 * k + 2]);
      if (sx == 0 && sy == 0 && sz == 0) {
        newj[k] = oj[k];
        continue;
      }
      std::array<int64_t, 4> key = {oj[k], sx, sy, sz};
      auto it = gmap.find(key);
      if (it == gmap.end()) {
        int32_t gid = int32_t(s.n + int64_t(ghosts.owner.size()));
        gmap.emplace(key, gid);
        ghosts.owner.push_back(oj[k]);
        for (int m = 0; m < 3; ++m)
          ghosts.shift_cart.push_back(double(sx) * s.cell[0 + m] +
                                      double(sy) * s.cell[3 + m] +
                                      double(sz) * s.cell[6 + m]);
        newj[k] = gid;
      } else {
        newj[k] = it->second;
      }
    }
  } else {
    for (int64_t k = 0; k < ne; ++k) newj[k] = oj[k];
  }
  // stable sort by center
  std::vector<int64_t> order(ne);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return oi[a] < oi[b]; });
  EdgeSet es;
  es.n_real = ne;
  es.eidx.assign(2 * n_edges_pad, int32_t(sentinel));
  es.edge_mask.assign(n_edges_pad, 0);
  for (int64_t k = 0; k < ne; ++k) {
    es.eidx[k] = oi[order[k]];
    es.eidx[n_edges_pad + k] = newj[order[k]];
    es.edge_mask[k] = 1;
  }
  return es;
}

int selftest();

}  // namespace

int main(int argc, char** argv) {
  std::string artifact, plugin, init, out_prefix = "allegro_md_";
  int64_t steps = 100;
  double dt = 1e-3, skin = 0.5;
  int64_t dump_every = 0;
  std::vector<std::pair<std::string, std::string>> options;
  bool do_selftest = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) die("missing value for " + a);
      return argv[++i];
    };
    if (a == "--artifact") artifact = next();
    else if (a == "--plugin") plugin = next();
    else if (a == "--init") init = next();
    else if (a == "--steps") steps = std::atoll(next().c_str());
    else if (a == "--dt") dt = std::atof(next().c_str());
    else if (a == "--skin") skin = std::atof(next().c_str());
    else if (a == "--out-prefix") out_prefix = next();
    else if (a == "--dump-every") dump_every = std::atoll(next().c_str());
    else if (a == "--option") {
      std::string kv = next();
      auto eq = kv.find('=');
      if (eq == std::string::npos) die("--option expects key=value");
      options.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
    } else if (a == "--selftest") do_selftest = true;
    else die("unknown arg " + a);
  }
  if (do_selftest) return selftest();
  if (artifact.empty() || plugin.empty() || init.empty())
    die("required: --artifact --plugin --init (or --selftest)");

  // --- artifact ---
  auto zip = read_zip(read_file(artifact));
  const ZipEntry* mlir_e = find_entry(zip, "model.mlir");
  const ZipEntry* params_e = find_entry(zip, "params.npz");
  const ZipEntry* meta_e = find_entry(zip, "meta.json");
  const ZipEntry* copts_e = find_entry(zip, "compile_options.pb");
  if (!mlir_e || !params_e || !meta_e) die("artifact missing entries");
  std::string meta(reinterpret_cast<const char*>(meta_e->data.data()),
                   meta_e->data.size());
  int64_t n_atoms_pad = json_int(meta, "n_atoms");
  int64_t n_edges_pad = json_int(meta, "n_edges");
  int64_t n_params = json_int(meta, "n_params");
  double r_max = 0.0;
  {
    auto p = meta.find("'r_max': '");
    if (p == std::string::npos) p = meta.find("\"r_max\": \"");
    if (p != std::string::npos) r_max = std::atof(meta.c_str() + p + 10);
  }
  if (r_max <= 0) die("meta.json carries no r_max in config");
  auto params = parse_npz(params_e->data);
  std::fprintf(stderr,
               "allegro_md: artifact n_atoms=%lld n_edges=%lld params=%lld "
               "r_max=%.3f\n",
               (long long)n_atoms_pad, (long long)n_edges_pad,
               (long long)n_params, r_max);

  System sys = load_system(init);
  if (sys.n > n_atoms_pad)
    die("system has more atoms than the artifact's padded shape");

  // --- PJRT ---
  Pjrt pj;
  pj.init(plugin, options);
  std::vector<uint8_t> copts_bytes =
      copts_e ? copts_e->data : std::vector<uint8_t>{};
  PJRT_LoadedExecutable* exe = pj.compile(mlir_e->data, copts_bytes);
  std::fprintf(stderr, "allegro_md: compiled\n");

  // --- static device buffers: params + atom_types + node_mask ---
  std::vector<PJRT_Buffer*> param_bufs(n_params);
  for (int64_t i = 0; i < n_params; ++i) {
    auto& a = params.at("p" + std::to_string(i));
    PJRT_Buffer_Type t;
    if (a.descr == "<f4") t = PJRT_Buffer_Type_F32;
    else if (a.descr == "<f8") t = PJRT_Buffer_Type_F64;
    else if (a.descr == "<i4") t = PJRT_Buffer_Type_S32;
    else die("unsupported param dtype " + a.descr);
    param_bufs[i] = pj.to_device(a.data.data(), t, a.shape);
  }
  // types / node_mask are rebuilt at every re-neighboring for periodic
  // systems (the ghost count changes); buffers start empty
  std::vector<int32_t> types_pad(n_atoms_pad, 0);
  std::vector<uint8_t> node_mask(n_atoms_pad, 0);
  PJRT_Buffer* types_buf = nullptr;
  PJRT_Buffer* nmask_buf = nullptr;

  // --- MD loop ---
  size_t num_args = size_t(n_params) + 5;
  // 3 (atomic_energy, forces, total_energy) or 4 (+virial: the
  // pair_allegro_stress target)
  size_t num_outputs = size_t(json_list_len(meta, "outputs"));
  if (num_outputs < 3) die("artifact declares fewer than 3 outputs");
  std::vector<float> pos_f(n_atoms_pad * 3, 0.0f);
  std::vector<float> forces_f(n_atoms_pad * 3);
  std::vector<float> aenergy_f(n_atoms_pad);
  std::vector<double> force(3 * sys.n, 0.0), force_new(3 * sys.n);
  std::vector<double> ref_pos;
  EdgeSet edges;
  GhostSet ghosts;
  PJRT_Buffer* eidx_buf = nullptr;
  PJRT_Buffer* emask_buf = nullptr;
  int64_t rebuilds = 0;

  auto need_rebuild = [&]() {
    if (ref_pos.empty()) return true;
    double lim = 0.25 * skin * skin;
    for (int64_t i = 0; i < 3 * sys.n; i += 3) {
      double dx = sys.pos[i] - ref_pos[i], dy = sys.pos[i + 1] - ref_pos[i + 1],
             dz = sys.pos[i + 2] - ref_pos[i + 2];
      if (dx * dx + dy * dy + dz * dz > lim) return true;
    }
    return false;
  };

  auto rebuild = [&]() {
    wrap_positions(sys);  // re-neighboring-time wrap (periodic only)
    edges = build_edges(sys, r_max + skin, n_edges_pad, n_atoms_pad, ghosts);
    int64_t G = int64_t(ghosts.owner.size());
    if (sys.n + G > n_atoms_pad)
      die("atoms + ghosts (" + std::to_string(sys.n + G) +
          ") exceed artifact n_atoms " + std::to_string(n_atoms_pad));
    std::fill(types_pad.begin(), types_pad.end(), 0);
    std::fill(node_mask.begin(), node_mask.end(), 0);
    for (int64_t i = 0; i < sys.n; ++i) {
      types_pad[i] = sys.types[i];
      node_mask[i] = 1;  // ghosts too: forces are NODE_MASK-gated on device
    }
    for (int64_t g = 0; g < G; ++g) {
      types_pad[sys.n + g] = sys.types[ghosts.owner[g]];
      node_mask[sys.n + g] = 1;
    }
    pj.destroy(types_buf);
    pj.destroy(nmask_buf);
    types_buf = pj.to_device(types_pad.data(), PJRT_Buffer_Type_S32, {n_atoms_pad});
    nmask_buf = pj.to_device(node_mask.data(), PJRT_Buffer_Type_PRED, {n_atoms_pad});
    pj.destroy(eidx_buf);
    pj.destroy(emask_buf);
    eidx_buf = pj.to_device(edges.eidx.data(), PJRT_Buffer_Type_S32, {2, n_edges_pad});
    emask_buf = pj.to_device(edges.edge_mask.data(), PJRT_Buffer_Type_PRED, {n_edges_pad});
    ref_pos = sys.pos;
    rebuilds++;
  };

  double total_energy = 0.0;
  double virial[9] = {0};  // Σ rᵢ⊗fᵢ over real+ghost rows (fdotr, LAMMPS form)
  auto eval_forces = [&](std::vector<double>& f_out) {
    int64_t G = int64_t(ghosts.owner.size());
    for (int64_t i = 0; i < 3 * sys.n; ++i) pos_f[i] = float(sys.pos[i]);
    // ghost coordinates refresh EVERY step from the current owner positions
    // (the edge list and ghost identities are static between rebuilds)
    for (int64_t g = 0; g < G; ++g) {
      int64_t o = ghosts.owner[g];
      for (int m = 0; m < 3; ++m)
        pos_f[3 * (sys.n + g) + m] =
            float(sys.pos[3 * o + m] + ghosts.shift_cart[3 * g + m]);
    }
    PJRT_Buffer* pos_buf = pj.to_device(pos_f.data(), PJRT_Buffer_Type_F32, {n_atoms_pad, 3});
    std::vector<PJRT_Buffer*> args(num_args);
    for (int64_t i = 0; i < n_params; ++i) args[i] = param_bufs[i];
    args[n_params + 0] = pos_buf;
    args[n_params + 1] = eidx_buf;
    args[n_params + 2] = types_buf;
    args[n_params + 3] = nmask_buf;
    args[n_params + 4] = emask_buf;
    PJRT_Buffer* const* arg_list[1] = {args.data()};
    std::vector<PJRT_Buffer*> outs(num_outputs, nullptr);
    PJRT_Buffer** out_list[1] = {outs.data()};
    PJRT_Event* done[1] = {nullptr};
    PJRT_ExecuteOptions eopts;
    std::memset(&eopts, 0, sizeof(eopts));
    eopts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_LoadedExecutable_Execute_Args ea;
    std::memset(&ea, 0, sizeof(ea));
    ea.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ea.executable = exe;
    ea.options = &eopts;
    ea.argument_lists = arg_list;
    ea.num_devices = 1;
    ea.num_args = num_args;
    ea.output_lists = out_list;
    ea.device_complete_events = done;
    pj.check(pj.api->PJRT_LoadedExecutable_Execute(&ea), "Execute");
    pj.await(done[0], "execute done");
    // outputs: [0] atomic_energy [Na,1], [1] forces [Na,3], [2] total_energy
    pj.to_host(outs[1], forces_f.data(), forces_f.size() * sizeof(float), 2);
    // energy = Σ atomic_energy over REAL rows: ghost rows carry a spurious
    // per-type shift constant (ghost node_mask must stay 1 for forces)
    pj.to_host(outs[0], aenergy_f.data(), aenergy_f.size() * sizeof(float), 2);
    total_energy = 0.0;
    for (int64_t i = 0; i < sys.n; ++i) total_energy += double(aenergy_f[i]);
    for (size_t k = 0; k < num_outputs; ++k) pj.destroy(outs[k]);
    pj.destroy(pos_buf);
    for (int64_t i = 0; i < 3 * sys.n; ++i) f_out[i] = double(forces_f[i]);
    // ghost-force collapse onto owners (pair_allegro's MPI force return,
    // here a host-side segment add)
    for (int64_t g = 0; g < G; ++g) {
      int64_t o = ghosts.owner[g];
      for (int m = 0; m < 3; ++m)
        f_out[3 * o + m] += double(forces_f[3 * (sys.n + g) + m]);
    }
    // virial (fdotr over real + UNCOLLAPSED ghost rows — exact for the
    // translation-invariant ghost-format energy; stress = -virial / volume)
    std::fill(virial, virial + 9, 0.0);
    for (int64_t i = 0; i < sys.n + G; ++i)
      for (int a = 0; a < 3; ++a)
        for (int b = 0; b < 3; ++b)
          virial[3 * a + b] += double(pos_f[3 * i + a]) * double(forces_f[3 * i + b]);
  };

  rebuild();
  eval_forces(force);
  std::fprintf(stderr, "allegro_md: step 0 E=%.6f\n", total_energy);
  std::vector<float> traj;
  for (int64_t step = 1; step <= steps; ++step) {
    for (int64_t i = 0; i < sys.n; ++i) {
      double im = 1.0 / sys.mass[i];
      for (int k = 0; k < 3; ++k) {
        sys.pos[3 * i + k] += dt * sys.vel[3 * i + k] +
                              0.5 * dt * dt * im * force[3 * i + k];
      }
    }
    if (need_rebuild()) rebuild();
    eval_forces(force_new);
    for (int64_t i = 0; i < sys.n; ++i) {
      double im = 1.0 / sys.mass[i];
      for (int k = 0; k < 3; ++k)
        sys.vel[3 * i + k] += 0.5 * dt * im * (force[3 * i + k] + force_new[3 * i + k]);
    }
    std::swap(force, force_new);
    if (dump_every && step % dump_every == 0) {
      for (int64_t i = 0; i < 3 * sys.n; ++i) traj.push_back(float(sys.pos[i]));
      double ke = 0;
      for (int64_t i = 0; i < sys.n; ++i)
        for (int k = 0; k < 3; ++k)
          ke += 0.5 * sys.mass[i] * sys.vel[3 * i + k] * sys.vel[3 * i + k];
      std::fprintf(stderr, "allegro_md: step %lld E=%.6f KE=%.6f E+KE=%.6f\n",
                   (long long)step, total_energy, ke, total_energy + ke);
    }
  }
  write_npy(out_prefix + "positions.npy", sys.pos.data(), {sys.n, 3}, "<f8");
  write_npy(out_prefix + "velocities.npy", sys.vel.data(), {sys.n, 3}, "<f8");
  write_npy(out_prefix + "virial.npy", virial, {3, 3}, "<f8");
  if (!traj.empty())
    write_npy(out_prefix + "trajectory.npy", traj.data(),
              {int64_t(traj.size() / (3 * sys.n)), sys.n, 3}, "<f4");
  std::fprintf(stderr, "allegro_md: done (%lld steps, %lld rebuilds) E=%.6f\n",
               (long long)steps, (long long)rebuilds, total_energy);
  std::printf("{\"steps\": %lld, \"rebuilds\": %lld, \"final_energy\": %.8f}\n",
              (long long)steps, (long long)rebuilds, total_energy);
  return 0;
}

namespace {

// --selftest: artifact-free checks of the native pieces (zip/npy round trip +
// velocity-Verlet energy conservation on an analytic harmonic dimer)
int selftest() {
  // npy round-trip
  std::vector<double> x = {1.0, 2.0, 3.0, 4.0, 5.0, 6.0};
  write_npy("/tmp/_allegro_md_self.npy", x.data(), {2, 3}, "<f8");
  auto back = parse_npy(read_file("/tmp/_allegro_md_self.npy"));
  if (back.shape[0] != 2 || back.shape[1] != 3) die("selftest: npy shape");
  if (std::memcmp(back.data.data(), x.data(), sizeof(double) * 6) != 0)
    die("selftest: npy data");

  // neighbor list sanity: 3 atoms on a line, r_max covers nearest only
  {
    std::vector<double> pos = {0, 0, 0, 1, 0, 0, 2.5, 0, 0};
    double cell[9] = {1e6, 0, 0, 0, 1e6, 0, 0, 0, 1e6};
    int pbc[3] = {0, 0, 0};
    int oi[32], oj[32];
    double os[96];
    long long ne = atpu_neighbor_list(pos.data(), 3, cell, pbc, 1.8, 32, oi, oj, os);
    if (ne != 4) die("selftest: expected 4 edges, got " + std::to_string(ne));
  }

  // harmonic dimer NVE: E conserved to O(dt^2)
  double k = 4.0, m = 1.0, dt = 1e-3;
  double x1 = -0.6, x2 = 0.6, v1 = 0.1, v2 = -0.1;  // r0 = 1.0
  auto f = [&](double r) { return -k * (r - 1.0); };
  double r = x2 - x1;
  double fr = f(r);
  double e0 = 0.5 * k * (r - 1) * (r - 1) + 0.5 * m * (v1 * v1 + v2 * v2);
  for (int s = 0; s < 20000; ++s) {
    x1 += dt * v1 - 0.5 * dt * dt / m * fr;
    x2 += dt * v2 + 0.5 * dt * dt / m * fr;
    double fn = f(x2 - x1);
    v1 += 0.5 * dt / m * (-fr - fn);
    v2 += 0.5 * dt / m * (fr + fn);
    fr = fn;
  }
  r = x2 - x1;
  double e1 = 0.5 * k * (r - 1) * (r - 1) + 0.5 * m * (v1 * v1 + v2 * v2);
  if (std::abs(e1 - e0) > 1e-6 * std::max(1.0, std::abs(e0)))
    die("selftest: NVE drift " + std::to_string(e1 - e0));
  std::printf("selftest OK\n");
  return 0;
}

}  // namespace
