// Independent-validation driver for the UPSTREAM reference denoiser core.
//
// This file is OUR code: a ~100-line raw-array harness that links against
// the reference's own src/core/*.cpp (built out-of-tree from
// /root/reference by scripts/independent_check.py — never copied into this
// repo). It exists so parity claims do not all chain through
// tests/reference_impl.py (same author as the engine): here the oracle is
// the reference's actual compiled C++ (Denoiser.cpp / DenoisingUnit.cpp /
// MultiscaleDenoiser.cpp), CPU path, no CUDA.
//
// Protocol (all little-endian on the only platform we run on):
//   argv: in.bin out.bin
//   in.bin:  int32[8]  = w, h, nbOfBins, nbOfScales, patchRadius,
//                        searchRadius, useRandomPixelOrder, nbOfCores
//            float32[2] = histogramDistanceThreshold, minEigenValue
//            float32[h*w*3]        color        (line-major, depth minor —
//            float32[h*w]          nbOfSamples   DeepImage::glueIndices
//            float32[h*w*nbOfBins] histograms    layout == numpy (H,W,D))
//            float32[h*w*6]        covariances  (xx,yy,zz,yz,xz,xy)
//   out.bin: float32[h*w*3] denoised color
//
// Determinism note: we set m_markedPixelsSkippingProbability = 0 so every
// pixel is denoised and the summed-estimate aggregation is order-independent
// (Denoiser.cpp accumulates per-core images and reduces) — this is the
// semantics bcd_tpu's exact path implements (see DESIGN.md section 1).

#include "Denoiser.h"
#include "MultiscaleDenoiser.h"
#include "DeepImage.h"
#include "IDenoiser.h"

#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <memory>

static void readf(FILE* f, void* p, size_t n)
{
    if (fread(p, 1, n, f) != n) {
        std::fprintf(stderr, "ref_driver: short read\n");
        std::exit(2);
    }
}

int main(int argc, char** argv)
{
    if (argc != 3) {
        std::fprintf(stderr, "usage: ref_driver in.bin out.bin\n");
        return 1;
    }
    FILE* f = std::fopen(argv[1], "rb");
    if (!f) { std::perror("ref_driver: open in.bin"); return 2; }

    int32_t hdr[8];
    float fhdr[2];
    readf(f, hdr, sizeof hdr);
    readf(f, fhdr, sizeof fhdr);
    const int w = hdr[0], h = hdr[1], bins = hdr[2], scales = hdr[3];
    const int patchR = hdr[4], searchR = hdr[5];
    const int randomOrder = hdr[6], cores = hdr[7];

    bcd::DeepImage<float> color(w, h, 3), nb(w, h, 1);
    bcd::DeepImage<float> histo(w, h, bins), cov(w, h, 6);
    readf(f, color.getDataPtr(), sizeof(float) * color.getSize());
    readf(f, nb.getDataPtr(), sizeof(float) * nb.getSize());
    readf(f, histo.getDataPtr(), sizeof(float) * histo.getSize());
    readf(f, cov.getDataPtr(), sizeof(float) * cov.getSize());
    std::fclose(f);

    bcd::DeepImage<float> out(w, h, 3);

    bcd::DenoiserInputs inputs;
    inputs.m_pColors = &color;
    inputs.m_pNbOfSamples = &nb;
    inputs.m_pHistograms = &histo;
    inputs.m_pSampleCovariances = &cov;

    bcd::DenoiserOutputs outputs;
    outputs.m_pDenoisedColors = &out;

    bcd::DenoiserParameters params;
    params.m_histogramDistanceThreshold = fhdr[0];
    params.m_minEigenValue = fhdr[1];
    params.m_patchRadius = patchR;
    params.m_searchWindowRadius = searchR;
    params.m_useRandomPixelOrder = randomOrder != 0;
    params.m_markedPixelsSkippingProbability = 0.f;  // denoise every pixel
    params.m_nbOfCores = cores;
    params.m_useCuda = false;

    std::unique_ptr<bcd::IDenoiser> denoiser;
    if (scales > 1)
        denoiser.reset(new bcd::MultiscaleDenoiser(scales));
    else
        denoiser.reset(new bcd::Denoiser());
    denoiser->setInputs(inputs);
    denoiser->setOutputs(outputs);
    denoiser->setParameters(params);
    if (!denoiser->denoise()) {
        std::fprintf(stderr, "ref_driver: denoise() failed\n");
        return 3;
    }

    FILE* g = std::fopen(argv[2], "wb");
    if (!g) { std::perror("ref_driver: open out.bin"); return 2; }
    std::fwrite(out.getDataPtr(), sizeof(float), out.getSize(), g);
    std::fclose(g);
    return 0;
}
