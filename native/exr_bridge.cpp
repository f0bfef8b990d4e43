// C ABI bridge to the system OpenEXR (BSD-3) for the compressions the
// pure-numpy codec (bcd_tpu/io/exr.py) does not decode itself (PIZ, B44,
// DWAA/DWAB). The reference links IlmImf through an AGPL wrapper
// (src/io/exr/io_exr.cpp) that must not be reused; this bridge is an
// original, minimal surface: read every channel of a single-part scanline
// EXR as planar float32 (Imf converts HALF/UINT on the fly), and write
// planar float32 channels with a chosen compression.
//
// Build (on demand, see bcd_tpu/io/exr_native.py):
//   g++ -O2 -shared -fPIC exr_bridge.cpp -o libexr_bridge.so
//       -I/usr/include/OpenEXR -I/usr/include/Imath
//       -lOpenEXR-3_1 -lIex-3_1 -lIlmThread-3_1 -lImath-3_1

#include <ImfChannelList.h>
#include <ImfFrameBuffer.h>
#include <ImfHeader.h>
#include <ImfInputFile.h>
#include <ImfOutputFile.h>

#include <cstring>
#include <string>
#include <vector>

using namespace Imf;
using namespace Imath;

namespace {
thread_local std::string g_error;

void set_error(const std::exception &e) { g_error = e.what(); }
}  // namespace

extern "C" {

const char *exr_bridge_last_error() { return g_error.c_str(); }

// Query image geometry. Returns 0 on success. names_buf receives the
// channel names in FILE ORDER (ChannelList iterates alphabetically, the
// same order the numpy codec uses), '\n'-separated, NUL-terminated.
int exr_bridge_info(const char *path, int *width, int *height,
                    int *n_channels, int *compression, char *names_buf,
                    int names_cap) {
    try {
        InputFile file(path);
        const Header &hdr = file.header();
        Box2i dw = hdr.dataWindow();
        *width = dw.max.x - dw.min.x + 1;
        *height = dw.max.y - dw.min.y + 1;
        *compression = static_cast<int>(hdr.compression());
        std::string names;
        int count = 0;
        for (ChannelList::ConstIterator it = hdr.channels().begin();
             it != hdr.channels().end(); ++it) {
            if (count) names += '\n';
            names += it.name();
            ++count;
        }
        *n_channels = count;
        if (static_cast<int>(names.size()) + 1 > names_cap) {
            g_error = "channel-name buffer too small";
            return 2;
        }
        std::memcpy(names_buf, names.c_str(), names.size() + 1);
        return 0;
    } catch (const std::exception &e) {
        set_error(e);
        return 1;
    }
}

// Read all channels as planar float32: out has n_channels * height * width
// floats, channel-major in file (alphabetical) order.
int exr_bridge_read(const char *path, float *out, int n_channels, int height,
                    int width) {
    try {
        InputFile file(path);
        const Header &hdr = file.header();
        Box2i dw = hdr.dataWindow();
        FrameBuffer fb;
        int ci = 0;
        for (ChannelList::ConstIterator it = hdr.channels().begin();
             it != hdr.channels().end(); ++it, ++ci) {
            if (ci >= n_channels) {
                g_error = "channel count mismatch";
                return 2;
            }
            char *base = reinterpret_cast<char *>(
                out + static_cast<size_t>(ci) * height * width -
                (static_cast<size_t>(dw.min.y) * width + dw.min.x));
            fb.insert(it.name(),
                      Slice(FLOAT, base, sizeof(float),
                            sizeof(float) * width));
        }
        file.setFrameBuffer(fb);
        file.readPixels(dw.min.y, dw.max.y);
        return 0;
    } catch (const std::exception &e) {
        set_error(e);
        return 1;
    }
}

// Write planar float32 channels. names: '\n'-separated channel names (must
// match the planar order of data). pixel_types: per channel, 1 = HALF,
// 2 = FLOAT (the two types the BCD contract uses). compression: the
// Imf::Compression enum value (3 = ZIP, 4 = PIZ, 5 = PXR24, ...).
int exr_bridge_write(const char *path, const float *data, const char *names,
                     const int *pixel_types, int n_channels, int height,
                     int width, int compression) {
    try {
        Header hdr(width, height);
        hdr.compression() = static_cast<Compression>(compression);

        std::vector<std::string> name_list;
        {
            std::string cur;
            for (const char *p = names;; ++p) {
                if (*p == '\n' || *p == '\0') {
                    name_list.push_back(cur);
                    cur.clear();
                    if (*p == '\0') break;
                } else {
                    cur += *p;
                }
            }
        }
        if (static_cast<int>(name_list.size()) != n_channels) {
            g_error = "channel name count mismatch";
            return 2;
        }

        // HALF channels need staging buffers
        std::vector<std::vector<half>> half_planes(n_channels);
        FrameBuffer fb;
        for (int ci = 0; ci < n_channels; ++ci) {
            const size_t plane = static_cast<size_t>(ci) * height * width;
            if (pixel_types[ci] == 1) {
                hdr.channels().insert(name_list[ci], Channel(HALF));
                half_planes[ci].resize(static_cast<size_t>(height) * width);
                for (size_t i = 0; i < half_planes[ci].size(); ++i)
                    half_planes[ci][i] = half(data[plane + i]);
                fb.insert(name_list[ci],
                          Slice(HALF,
                                reinterpret_cast<char *>(
                                    half_planes[ci].data()),
                                sizeof(half), sizeof(half) * width));
            } else {
                hdr.channels().insert(name_list[ci], Channel(FLOAT));
                fb.insert(name_list[ci],
                          Slice(FLOAT,
                                const_cast<char *>(
                                    reinterpret_cast<const char *>(
                                        data + plane)),
                                sizeof(float), sizeof(float) * width));
            }
        }
        OutputFile file(path, hdr);
        file.setFrameBuffer(fb);
        file.writePixels(height);
        return 0;
    } catch (const std::exception &e) {
        set_error(e);
        return 1;
    }
}

}  // extern "C"
