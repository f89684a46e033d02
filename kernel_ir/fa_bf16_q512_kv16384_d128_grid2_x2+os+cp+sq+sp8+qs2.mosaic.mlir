module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x1x16384x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x1x16384x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<512x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<512x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 4, 32, 1>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 512, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 1, 16384, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 1, 16384, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 512, 128>}]} {
    %cst = arith.constant dense<0.000000e+00> : vector<256x1xf32>
    %cst_0 = arith.constant dense<0.127517432> : vector<512x128xf32>
    %c256 = arith.constant 256 : index
    %cst_1 = arith.constant dense<0.000000e+00> : vector<256x128xf32>
    %cst_2 = arith.constant dense<0.000000e+00> : vector<256xf32>
    %cst_3 = arith.constant dense<0xFF800000> : vector<256xf32>
    %cst_4 = arith.constant dense<0.000000e+00> : vector<256x2048xf32>
    %c0 = arith.constant 0 : index
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x512x128xbf16> to vector<512x128xbf16>
    %4 = arith.extf %3 : vector<512x128xbf16> to vector<512x128xf32>
    %5 = arith.mulf %4, %cst_0 : vector<512x128xf32>
    %6 = arith.truncf %5 : vector<512x128xf32> to vector<512x128xbf16>
    %7 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x1x16384x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x16384x128xbf16>
    %8 = vector.shape_cast %7 : vector<1x1x16384x128xbf16> to vector<16384x128xbf16>
    %9 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x1x16384x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x16384x128xbf16>
    %10 = vector.shape_cast %9 : vector<1x1x16384x128xbf16> to vector<16384x128xbf16>
    %11 = vector.extract_strided_slice %6 {offsets = [0, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %15 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %16 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %17 = tpu.matmul %11, %15, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %18 = vector.multi_reduction <maximumf>, %17, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %19 = vector.shape_cast %18 : vector<256xf32> to vector<256x1xf32>
      %20 = vector.broadcast %19 : vector<256x1xf32> to vector<256x2048xf32>
      %21 = arith.subf %17, %20 : vector<256x2048xf32>
      %22 = math.exp2 %21 : vector<256x2048xf32>
      %23 = arith.truncf %22 : vector<256x2048xf32> to vector<256x2048xbf16>
      %24 = vector.multi_reduction <add>, %22, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %25 = vector.shape_cast %24 : vector<256xf32> to vector<256x1xf32>
      %26 = tpu.matmul %23, %16, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %27 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %28 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %29 = tpu.matmul %11, %27, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %30 = vector.multi_reduction <maximumf>, %29, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %31 = vector.shape_cast %30 : vector<256xf32> to vector<256x1xf32>
      %32 = vector.broadcast %31 : vector<256x1xf32> to vector<256x2048xf32>
      %33 = arith.subf %29, %32 : vector<256x2048xf32>
      %34 = math.exp2 %33 : vector<256x2048xf32>
      %35 = arith.truncf %34 : vector<256x2048xf32> to vector<256x2048xbf16>
      %36 = vector.multi_reduction <add>, %34, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %37 = vector.shape_cast %36 : vector<256xf32> to vector<256x1xf32>
      %38 = tpu.matmul %35, %28, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %39 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %40 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %41 = tpu.matmul %11, %39, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %42 = vector.multi_reduction <maximumf>, %41, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %43 = vector.shape_cast %42 : vector<256xf32> to vector<256x1xf32>
      %44 = vector.broadcast %43 : vector<256x1xf32> to vector<256x2048xf32>
      %45 = arith.subf %41, %44 : vector<256x2048xf32>
      %46 = math.exp2 %45 : vector<256x2048xf32>
      %47 = arith.truncf %46 : vector<256x2048xf32> to vector<256x2048xbf16>
      %48 = vector.multi_reduction <add>, %46, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %49 = vector.shape_cast %48 : vector<256xf32> to vector<256x1xf32>
      %50 = tpu.matmul %47, %40, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %51 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %52 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %53 = tpu.matmul %11, %51, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %54 = vector.multi_reduction <maximumf>, %53, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %55 = vector.shape_cast %54 : vector<256xf32> to vector<256x1xf32>
      %56 = vector.broadcast %55 : vector<256x1xf32> to vector<256x2048xf32>
      %57 = arith.subf %53, %56 : vector<256x2048xf32>
      %58 = math.exp2 %57 : vector<256x2048xf32>
      %59 = arith.truncf %58 : vector<256x2048xf32> to vector<256x2048xbf16>
      %60 = vector.multi_reduction <add>, %58, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %61 = vector.shape_cast %60 : vector<256xf32> to vector<256x1xf32>
      %62 = tpu.matmul %59, %52, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %63 = vector.extract_strided_slice %8 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %64 = vector.extract_strided_slice %10 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %65 = tpu.matmul %11, %63, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %66 = vector.multi_reduction <maximumf>, %65, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %67 = vector.shape_cast %66 : vector<256xf32> to vector<256x1xf32>
      %68 = vector.broadcast %67 : vector<256x1xf32> to vector<256x2048xf32>
      %69 = arith.subf %65, %68 : vector<256x2048xf32>
      %70 = math.exp2 %69 : vector<256x2048xf32>
      %71 = arith.truncf %70 : vector<256x2048xf32> to vector<256x2048xbf16>
      %72 = vector.multi_reduction <add>, %70, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %73 = vector.shape_cast %72 : vector<256xf32> to vector<256x1xf32>
      %74 = tpu.matmul %71, %64, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %75 = vector.extract_strided_slice %8 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %76 = vector.extract_strided_slice %10 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %77 = tpu.matmul %11, %75, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %78 = vector.multi_reduction <maximumf>, %77, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %79 = vector.shape_cast %78 : vector<256xf32> to vector<256x1xf32>
      %80 = vector.broadcast %79 : vector<256x1xf32> to vector<256x2048xf32>
      %81 = arith.subf %77, %80 : vector<256x2048xf32>
      %82 = math.exp2 %81 : vector<256x2048xf32>
      %83 = arith.truncf %82 : vector<256x2048xf32> to vector<256x2048xbf16>
      %84 = vector.multi_reduction <add>, %82, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %85 = vector.shape_cast %84 : vector<256xf32> to vector<256x1xf32>
      %86 = tpu.matmul %83, %76, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %87 = vector.extract_strided_slice %8 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %88 = vector.extract_strided_slice %10 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %89 = tpu.matmul %11, %87, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %90 = vector.multi_reduction <maximumf>, %89, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %91 = vector.shape_cast %90 : vector<256xf32> to vector<256x1xf32>
      %92 = vector.broadcast %91 : vector<256x1xf32> to vector<256x2048xf32>
      %93 = arith.subf %89, %92 : vector<256x2048xf32>
      %94 = math.exp2 %93 : vector<256x2048xf32>
      %95 = arith.truncf %94 : vector<256x2048xf32> to vector<256x2048xbf16>
      %96 = vector.multi_reduction <add>, %94, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %97 = vector.shape_cast %96 : vector<256xf32> to vector<256x1xf32>
      %98 = tpu.matmul %95, %88, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %99 = vector.extract_strided_slice %8 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %100 = vector.extract_strided_slice %10 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %101 = tpu.matmul %11, %99, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %102 = vector.multi_reduction <maximumf>, %101, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %103 = vector.shape_cast %102 : vector<256xf32> to vector<256x1xf32>
      %104 = vector.broadcast %103 : vector<256x1xf32> to vector<256x2048xf32>
      %105 = arith.subf %101, %104 : vector<256x2048xf32>
      %106 = math.exp2 %105 : vector<256x2048xf32>
      %107 = arith.truncf %106 : vector<256x2048xf32> to vector<256x2048xbf16>
      %108 = vector.multi_reduction <add>, %106, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %109 = vector.shape_cast %108 : vector<256xf32> to vector<256x1xf32>
      %110 = tpu.matmul %107, %100, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %111 = arith.maximumf %19, %31 : vector<256x1xf32>
      %112 = arith.maximumf %111, %43 : vector<256x1xf32>
      %113 = arith.maximumf %112, %55 : vector<256x1xf32>
      %114 = arith.maximumf %113, %67 : vector<256x1xf32>
      %115 = arith.maximumf %114, %79 : vector<256x1xf32>
      %116 = arith.maximumf %115, %91 : vector<256x1xf32>
      %117 = arith.maximumf %116, %103 : vector<256x1xf32>
      %118 = vector.broadcast %117 : vector<256x1xf32> to vector<256x128xf32>
      %119 = arith.subf %19, %117 : vector<256x1xf32>
      %120 = math.exp2 %119 : vector<256x1xf32>
      %121 = arith.mulf %25, %120 : vector<256x1xf32>
      %122 = arith.addf %121, %cst : vector<256x1xf32>
      %123 = vector.broadcast %120 : vector<256x1xf32> to vector<256x128xf32>
      %124 = arith.mulf %26, %123 : vector<256x128xf32>
      %125 = arith.addf %124, %cst_1 : vector<256x128xf32>
      %126 = arith.subf %31, %117 : vector<256x1xf32>
      %127 = math.exp2 %126 : vector<256x1xf32>
      %128 = arith.mulf %37, %127 : vector<256x1xf32>
      %129 = arith.addf %122, %128 : vector<256x1xf32>
      %130 = vector.broadcast %127 : vector<256x1xf32> to vector<256x128xf32>
      %131 = arith.mulf %38, %130 : vector<256x128xf32>
      %132 = arith.addf %125, %131 : vector<256x128xf32>
      %133 = arith.subf %43, %117 : vector<256x1xf32>
      %134 = math.exp2 %133 : vector<256x1xf32>
      %135 = arith.mulf %49, %134 : vector<256x1xf32>
      %136 = arith.addf %129, %135 : vector<256x1xf32>
      %137 = vector.broadcast %134 : vector<256x1xf32> to vector<256x128xf32>
      %138 = arith.mulf %50, %137 : vector<256x128xf32>
      %139 = arith.addf %132, %138 : vector<256x128xf32>
      %140 = arith.subf %55, %117 : vector<256x1xf32>
      %141 = math.exp2 %140 : vector<256x1xf32>
      %142 = arith.mulf %61, %141 : vector<256x1xf32>
      %143 = arith.addf %136, %142 : vector<256x1xf32>
      %144 = vector.broadcast %141 : vector<256x1xf32> to vector<256x128xf32>
      %145 = arith.mulf %62, %144 : vector<256x128xf32>
      %146 = arith.addf %139, %145 : vector<256x128xf32>
      %147 = arith.subf %67, %117 : vector<256x1xf32>
      %148 = math.exp2 %147 : vector<256x1xf32>
      %149 = arith.mulf %73, %148 : vector<256x1xf32>
      %150 = arith.addf %143, %149 : vector<256x1xf32>
      %151 = vector.broadcast %148 : vector<256x1xf32> to vector<256x128xf32>
      %152 = arith.mulf %74, %151 : vector<256x128xf32>
      %153 = arith.addf %146, %152 : vector<256x128xf32>
      %154 = arith.subf %79, %117 : vector<256x1xf32>
      %155 = math.exp2 %154 : vector<256x1xf32>
      %156 = arith.mulf %85, %155 : vector<256x1xf32>
      %157 = arith.addf %150, %156 : vector<256x1xf32>
      %158 = vector.broadcast %155 : vector<256x1xf32> to vector<256x128xf32>
      %159 = arith.mulf %86, %158 : vector<256x128xf32>
      %160 = arith.addf %153, %159 : vector<256x128xf32>
      %161 = arith.subf %91, %117 : vector<256x1xf32>
      %162 = math.exp2 %161 : vector<256x1xf32>
      %163 = arith.mulf %97, %162 : vector<256x1xf32>
      %164 = arith.addf %157, %163 : vector<256x1xf32>
      %165 = vector.broadcast %162 : vector<256x1xf32> to vector<256x128xf32>
      %166 = arith.mulf %98, %165 : vector<256x128xf32>
      %167 = arith.addf %160, %166 : vector<256x128xf32>
      %168 = arith.subf %103, %117 : vector<256x1xf32>
      %169 = math.exp2 %168 : vector<256x1xf32>
      %170 = arith.mulf %109, %169 : vector<256x1xf32>
      %171 = arith.addf %164, %170 : vector<256x1xf32>
      %172 = vector.broadcast %169 : vector<256x1xf32> to vector<256x128xf32>
      %173 = arith.mulf %110, %172 : vector<256x128xf32>
      %174 = arith.addf %167, %173 : vector<256x128xf32>
      %175 = vector.broadcast %171 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %118 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %175 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %174 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %12 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %12 {
      %15 = vector.load %arg9[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %16 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %17 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %18 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %19 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %20 = tpu.matmul %11, %18, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %21 = vector.multi_reduction <maximumf>, %20, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %22 = vector.shape_cast %21 : vector<256xf32> to vector<256x1xf32>
      %23 = vector.broadcast %22 : vector<256x1xf32> to vector<256x2048xf32>
      %24 = arith.subf %20, %23 : vector<256x2048xf32>
      %25 = math.exp2 %24 : vector<256x2048xf32>
      %26 = arith.truncf %25 : vector<256x2048xf32> to vector<256x2048xbf16>
      %27 = vector.multi_reduction <add>, %25, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %28 = vector.shape_cast %27 : vector<256xf32> to vector<256x1xf32>
      %29 = tpu.matmul %26, %19, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %30 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %31 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %32 = tpu.matmul %11, %30, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %33 = vector.multi_reduction <maximumf>, %32, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %34 = vector.shape_cast %33 : vector<256xf32> to vector<256x1xf32>
      %35 = vector.broadcast %34 : vector<256x1xf32> to vector<256x2048xf32>
      %36 = arith.subf %32, %35 : vector<256x2048xf32>
      %37 = math.exp2 %36 : vector<256x2048xf32>
      %38 = arith.truncf %37 : vector<256x2048xf32> to vector<256x2048xbf16>
      %39 = vector.multi_reduction <add>, %37, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %40 = vector.shape_cast %39 : vector<256xf32> to vector<256x1xf32>
      %41 = tpu.matmul %38, %31, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %42 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %43 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %44 = tpu.matmul %11, %42, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %45 = vector.multi_reduction <maximumf>, %44, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %46 = vector.shape_cast %45 : vector<256xf32> to vector<256x1xf32>
      %47 = vector.broadcast %46 : vector<256x1xf32> to vector<256x2048xf32>
      %48 = arith.subf %44, %47 : vector<256x2048xf32>
      %49 = math.exp2 %48 : vector<256x2048xf32>
      %50 = arith.truncf %49 : vector<256x2048xf32> to vector<256x2048xbf16>
      %51 = vector.multi_reduction <add>, %49, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %52 = vector.shape_cast %51 : vector<256xf32> to vector<256x1xf32>
      %53 = tpu.matmul %50, %43, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %54 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %55 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %56 = tpu.matmul %11, %54, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %57 = vector.multi_reduction <maximumf>, %56, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %58 = vector.shape_cast %57 : vector<256xf32> to vector<256x1xf32>
      %59 = vector.broadcast %58 : vector<256x1xf32> to vector<256x2048xf32>
      %60 = arith.subf %56, %59 : vector<256x2048xf32>
      %61 = math.exp2 %60 : vector<256x2048xf32>
      %62 = arith.truncf %61 : vector<256x2048xf32> to vector<256x2048xbf16>
      %63 = vector.multi_reduction <add>, %61, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %64 = vector.shape_cast %63 : vector<256xf32> to vector<256x1xf32>
      %65 = tpu.matmul %62, %55, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %66 = vector.extract_strided_slice %8 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %67 = vector.extract_strided_slice %10 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %68 = tpu.matmul %11, %66, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %69 = vector.multi_reduction <maximumf>, %68, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %70 = vector.shape_cast %69 : vector<256xf32> to vector<256x1xf32>
      %71 = vector.broadcast %70 : vector<256x1xf32> to vector<256x2048xf32>
      %72 = arith.subf %68, %71 : vector<256x2048xf32>
      %73 = math.exp2 %72 : vector<256x2048xf32>
      %74 = arith.truncf %73 : vector<256x2048xf32> to vector<256x2048xbf16>
      %75 = vector.multi_reduction <add>, %73, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %76 = vector.shape_cast %75 : vector<256xf32> to vector<256x1xf32>
      %77 = tpu.matmul %74, %67, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %78 = vector.extract_strided_slice %8 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %79 = vector.extract_strided_slice %10 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %80 = tpu.matmul %11, %78, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %81 = vector.multi_reduction <maximumf>, %80, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %82 = vector.shape_cast %81 : vector<256xf32> to vector<256x1xf32>
      %83 = vector.broadcast %82 : vector<256x1xf32> to vector<256x2048xf32>
      %84 = arith.subf %80, %83 : vector<256x2048xf32>
      %85 = math.exp2 %84 : vector<256x2048xf32>
      %86 = arith.truncf %85 : vector<256x2048xf32> to vector<256x2048xbf16>
      %87 = vector.multi_reduction <add>, %85, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %88 = vector.shape_cast %87 : vector<256xf32> to vector<256x1xf32>
      %89 = tpu.matmul %86, %79, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %90 = vector.extract_strided_slice %8 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %91 = vector.extract_strided_slice %10 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %92 = tpu.matmul %11, %90, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %93 = vector.multi_reduction <maximumf>, %92, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %94 = vector.shape_cast %93 : vector<256xf32> to vector<256x1xf32>
      %95 = vector.broadcast %94 : vector<256x1xf32> to vector<256x2048xf32>
      %96 = arith.subf %92, %95 : vector<256x2048xf32>
      %97 = math.exp2 %96 : vector<256x2048xf32>
      %98 = arith.truncf %97 : vector<256x2048xf32> to vector<256x2048xbf16>
      %99 = vector.multi_reduction <add>, %97, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %100 = vector.shape_cast %99 : vector<256xf32> to vector<256x1xf32>
      %101 = tpu.matmul %98, %91, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %102 = vector.extract_strided_slice %8 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %103 = vector.extract_strided_slice %10 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %104 = tpu.matmul %11, %102, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %105 = vector.multi_reduction <maximumf>, %104, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %106 = vector.shape_cast %105 : vector<256xf32> to vector<256x1xf32>
      %107 = vector.broadcast %106 : vector<256x1xf32> to vector<256x2048xf32>
      %108 = arith.subf %104, %107 : vector<256x2048xf32>
      %109 = math.exp2 %108 : vector<256x2048xf32>
      %110 = arith.truncf %109 : vector<256x2048xf32> to vector<256x2048xbf16>
      %111 = vector.multi_reduction <add>, %109, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %112 = vector.shape_cast %111 : vector<256xf32> to vector<256x1xf32>
      %113 = tpu.matmul %110, %103, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %114 = arith.maximumf %22, %34 : vector<256x1xf32>
      %115 = arith.maximumf %114, %46 : vector<256x1xf32>
      %116 = arith.maximumf %115, %58 : vector<256x1xf32>
      %117 = arith.maximumf %116, %70 : vector<256x1xf32>
      %118 = arith.maximumf %117, %82 : vector<256x1xf32>
      %119 = arith.maximumf %118, %94 : vector<256x1xf32>
      %120 = arith.maximumf %119, %106 : vector<256x1xf32>
      %121 = vector.broadcast %120 : vector<256x1xf32> to vector<256x128xf32>
      %122 = arith.maximumf %15, %121 : vector<256x128xf32>
      %123 = vector.extract_strided_slice %122 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %124 = arith.subf %15, %122 : vector<256x128xf32>
      %125 = math.exp2 %124 : vector<256x128xf32>
      %126 = arith.subf %22, %123 : vector<256x1xf32>
      %127 = math.exp2 %126 : vector<256x1xf32>
      %128 = arith.mulf %28, %127 : vector<256x1xf32>
      %129 = arith.addf %128, %cst : vector<256x1xf32>
      %130 = vector.broadcast %127 : vector<256x1xf32> to vector<256x128xf32>
      %131 = arith.mulf %29, %130 : vector<256x128xf32>
      %132 = arith.addf %131, %cst_1 : vector<256x128xf32>
      %133 = arith.subf %34, %123 : vector<256x1xf32>
      %134 = math.exp2 %133 : vector<256x1xf32>
      %135 = arith.mulf %40, %134 : vector<256x1xf32>
      %136 = arith.addf %129, %135 : vector<256x1xf32>
      %137 = vector.broadcast %134 : vector<256x1xf32> to vector<256x128xf32>
      %138 = arith.mulf %41, %137 : vector<256x128xf32>
      %139 = arith.addf %132, %138 : vector<256x128xf32>
      %140 = arith.subf %46, %123 : vector<256x1xf32>
      %141 = math.exp2 %140 : vector<256x1xf32>
      %142 = arith.mulf %52, %141 : vector<256x1xf32>
      %143 = arith.addf %136, %142 : vector<256x1xf32>
      %144 = vector.broadcast %141 : vector<256x1xf32> to vector<256x128xf32>
      %145 = arith.mulf %53, %144 : vector<256x128xf32>
      %146 = arith.addf %139, %145 : vector<256x128xf32>
      %147 = arith.subf %58, %123 : vector<256x1xf32>
      %148 = math.exp2 %147 : vector<256x1xf32>
      %149 = arith.mulf %64, %148 : vector<256x1xf32>
      %150 = arith.addf %143, %149 : vector<256x1xf32>
      %151 = vector.broadcast %148 : vector<256x1xf32> to vector<256x128xf32>
      %152 = arith.mulf %65, %151 : vector<256x128xf32>
      %153 = arith.addf %146, %152 : vector<256x128xf32>
      %154 = arith.subf %70, %123 : vector<256x1xf32>
      %155 = math.exp2 %154 : vector<256x1xf32>
      %156 = arith.mulf %76, %155 : vector<256x1xf32>
      %157 = arith.addf %150, %156 : vector<256x1xf32>
      %158 = vector.broadcast %155 : vector<256x1xf32> to vector<256x128xf32>
      %159 = arith.mulf %77, %158 : vector<256x128xf32>
      %160 = arith.addf %153, %159 : vector<256x128xf32>
      %161 = arith.subf %82, %123 : vector<256x1xf32>
      %162 = math.exp2 %161 : vector<256x1xf32>
      %163 = arith.mulf %88, %162 : vector<256x1xf32>
      %164 = arith.addf %157, %163 : vector<256x1xf32>
      %165 = vector.broadcast %162 : vector<256x1xf32> to vector<256x128xf32>
      %166 = arith.mulf %89, %165 : vector<256x128xf32>
      %167 = arith.addf %160, %166 : vector<256x128xf32>
      %168 = arith.subf %94, %123 : vector<256x1xf32>
      %169 = math.exp2 %168 : vector<256x1xf32>
      %170 = arith.mulf %100, %169 : vector<256x1xf32>
      %171 = arith.addf %164, %170 : vector<256x1xf32>
      %172 = vector.broadcast %169 : vector<256x1xf32> to vector<256x128xf32>
      %173 = arith.mulf %101, %172 : vector<256x128xf32>
      %174 = arith.addf %167, %173 : vector<256x128xf32>
      %175 = arith.subf %106, %123 : vector<256x1xf32>
      %176 = math.exp2 %175 : vector<256x1xf32>
      %177 = arith.mulf %112, %176 : vector<256x1xf32>
      %178 = arith.addf %171, %177 : vector<256x1xf32>
      %179 = vector.broadcast %176 : vector<256x1xf32> to vector<256x128xf32>
      %180 = arith.mulf %113, %179 : vector<256x128xf32>
      %181 = arith.addf %174, %180 : vector<256x128xf32>
      %182 = arith.mulf %16, %125 : vector<256x128xf32>
      %183 = vector.broadcast %178 : vector<256x1xf32> to vector<256x128xf32>
      %184 = arith.addf %182, %183 : vector<256x128xf32>
      %185 = vector.extract_strided_slice %125 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %186 = vector.broadcast %185 : vector<256x1xf32> to vector<256x128xf32>
      %187 = arith.mulf %17, %186 : vector<256x128xf32>
      %188 = arith.addf %187, %181 : vector<256x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %122 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %184 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %188 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %13 = vector.extract_strided_slice %6 {offsets = [256, 0], sizes = [256, 128], strides = [1, 1]} : vector<512x128xbf16> to vector<256x128xbf16>
    scf.if %0 {
      %15 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %16 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %17 = tpu.matmul %13, %15, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %18 = vector.multi_reduction <maximumf>, %17, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %19 = vector.shape_cast %18 : vector<256xf32> to vector<256x1xf32>
      %20 = vector.broadcast %19 : vector<256x1xf32> to vector<256x2048xf32>
      %21 = arith.subf %17, %20 : vector<256x2048xf32>
      %22 = math.exp2 %21 : vector<256x2048xf32>
      %23 = arith.truncf %22 : vector<256x2048xf32> to vector<256x2048xbf16>
      %24 = vector.multi_reduction <add>, %22, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %25 = vector.shape_cast %24 : vector<256xf32> to vector<256x1xf32>
      %26 = tpu.matmul %23, %16, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %27 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %28 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %29 = tpu.matmul %13, %27, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %30 = vector.multi_reduction <maximumf>, %29, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %31 = vector.shape_cast %30 : vector<256xf32> to vector<256x1xf32>
      %32 = vector.broadcast %31 : vector<256x1xf32> to vector<256x2048xf32>
      %33 = arith.subf %29, %32 : vector<256x2048xf32>
      %34 = math.exp2 %33 : vector<256x2048xf32>
      %35 = arith.truncf %34 : vector<256x2048xf32> to vector<256x2048xbf16>
      %36 = vector.multi_reduction <add>, %34, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %37 = vector.shape_cast %36 : vector<256xf32> to vector<256x1xf32>
      %38 = tpu.matmul %35, %28, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %39 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %40 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %41 = tpu.matmul %13, %39, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %42 = vector.multi_reduction <maximumf>, %41, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %43 = vector.shape_cast %42 : vector<256xf32> to vector<256x1xf32>
      %44 = vector.broadcast %43 : vector<256x1xf32> to vector<256x2048xf32>
      %45 = arith.subf %41, %44 : vector<256x2048xf32>
      %46 = math.exp2 %45 : vector<256x2048xf32>
      %47 = arith.truncf %46 : vector<256x2048xf32> to vector<256x2048xbf16>
      %48 = vector.multi_reduction <add>, %46, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %49 = vector.shape_cast %48 : vector<256xf32> to vector<256x1xf32>
      %50 = tpu.matmul %47, %40, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %51 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %52 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %53 = tpu.matmul %13, %51, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %54 = vector.multi_reduction <maximumf>, %53, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %55 = vector.shape_cast %54 : vector<256xf32> to vector<256x1xf32>
      %56 = vector.broadcast %55 : vector<256x1xf32> to vector<256x2048xf32>
      %57 = arith.subf %53, %56 : vector<256x2048xf32>
      %58 = math.exp2 %57 : vector<256x2048xf32>
      %59 = arith.truncf %58 : vector<256x2048xf32> to vector<256x2048xbf16>
      %60 = vector.multi_reduction <add>, %58, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %61 = vector.shape_cast %60 : vector<256xf32> to vector<256x1xf32>
      %62 = tpu.matmul %59, %52, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %63 = vector.extract_strided_slice %8 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %64 = vector.extract_strided_slice %10 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %65 = tpu.matmul %13, %63, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %66 = vector.multi_reduction <maximumf>, %65, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %67 = vector.shape_cast %66 : vector<256xf32> to vector<256x1xf32>
      %68 = vector.broadcast %67 : vector<256x1xf32> to vector<256x2048xf32>
      %69 = arith.subf %65, %68 : vector<256x2048xf32>
      %70 = math.exp2 %69 : vector<256x2048xf32>
      %71 = arith.truncf %70 : vector<256x2048xf32> to vector<256x2048xbf16>
      %72 = vector.multi_reduction <add>, %70, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %73 = vector.shape_cast %72 : vector<256xf32> to vector<256x1xf32>
      %74 = tpu.matmul %71, %64, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %75 = vector.extract_strided_slice %8 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %76 = vector.extract_strided_slice %10 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %77 = tpu.matmul %13, %75, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %78 = vector.multi_reduction <maximumf>, %77, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %79 = vector.shape_cast %78 : vector<256xf32> to vector<256x1xf32>
      %80 = vector.broadcast %79 : vector<256x1xf32> to vector<256x2048xf32>
      %81 = arith.subf %77, %80 : vector<256x2048xf32>
      %82 = math.exp2 %81 : vector<256x2048xf32>
      %83 = arith.truncf %82 : vector<256x2048xf32> to vector<256x2048xbf16>
      %84 = vector.multi_reduction <add>, %82, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %85 = vector.shape_cast %84 : vector<256xf32> to vector<256x1xf32>
      %86 = tpu.matmul %83, %76, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %87 = vector.extract_strided_slice %8 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %88 = vector.extract_strided_slice %10 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %89 = tpu.matmul %13, %87, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %90 = vector.multi_reduction <maximumf>, %89, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %91 = vector.shape_cast %90 : vector<256xf32> to vector<256x1xf32>
      %92 = vector.broadcast %91 : vector<256x1xf32> to vector<256x2048xf32>
      %93 = arith.subf %89, %92 : vector<256x2048xf32>
      %94 = math.exp2 %93 : vector<256x2048xf32>
      %95 = arith.truncf %94 : vector<256x2048xf32> to vector<256x2048xbf16>
      %96 = vector.multi_reduction <add>, %94, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %97 = vector.shape_cast %96 : vector<256xf32> to vector<256x1xf32>
      %98 = tpu.matmul %95, %88, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %99 = vector.extract_strided_slice %8 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %100 = vector.extract_strided_slice %10 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %101 = tpu.matmul %13, %99, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %102 = vector.multi_reduction <maximumf>, %101, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %103 = vector.shape_cast %102 : vector<256xf32> to vector<256x1xf32>
      %104 = vector.broadcast %103 : vector<256x1xf32> to vector<256x2048xf32>
      %105 = arith.subf %101, %104 : vector<256x2048xf32>
      %106 = math.exp2 %105 : vector<256x2048xf32>
      %107 = arith.truncf %106 : vector<256x2048xf32> to vector<256x2048xbf16>
      %108 = vector.multi_reduction <add>, %106, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %109 = vector.shape_cast %108 : vector<256xf32> to vector<256x1xf32>
      %110 = tpu.matmul %107, %100, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %111 = arith.maximumf %19, %31 : vector<256x1xf32>
      %112 = arith.maximumf %111, %43 : vector<256x1xf32>
      %113 = arith.maximumf %112, %55 : vector<256x1xf32>
      %114 = arith.maximumf %113, %67 : vector<256x1xf32>
      %115 = arith.maximumf %114, %79 : vector<256x1xf32>
      %116 = arith.maximumf %115, %91 : vector<256x1xf32>
      %117 = arith.maximumf %116, %103 : vector<256x1xf32>
      %118 = vector.broadcast %117 : vector<256x1xf32> to vector<256x128xf32>
      %119 = arith.subf %19, %117 : vector<256x1xf32>
      %120 = math.exp2 %119 : vector<256x1xf32>
      %121 = arith.mulf %25, %120 : vector<256x1xf32>
      %122 = arith.addf %121, %cst : vector<256x1xf32>
      %123 = vector.broadcast %120 : vector<256x1xf32> to vector<256x128xf32>
      %124 = arith.mulf %26, %123 : vector<256x128xf32>
      %125 = arith.addf %124, %cst_1 : vector<256x128xf32>
      %126 = arith.subf %31, %117 : vector<256x1xf32>
      %127 = math.exp2 %126 : vector<256x1xf32>
      %128 = arith.mulf %37, %127 : vector<256x1xf32>
      %129 = arith.addf %122, %128 : vector<256x1xf32>
      %130 = vector.broadcast %127 : vector<256x1xf32> to vector<256x128xf32>
      %131 = arith.mulf %38, %130 : vector<256x128xf32>
      %132 = arith.addf %125, %131 : vector<256x128xf32>
      %133 = arith.subf %43, %117 : vector<256x1xf32>
      %134 = math.exp2 %133 : vector<256x1xf32>
      %135 = arith.mulf %49, %134 : vector<256x1xf32>
      %136 = arith.addf %129, %135 : vector<256x1xf32>
      %137 = vector.broadcast %134 : vector<256x1xf32> to vector<256x128xf32>
      %138 = arith.mulf %50, %137 : vector<256x128xf32>
      %139 = arith.addf %132, %138 : vector<256x128xf32>
      %140 = arith.subf %55, %117 : vector<256x1xf32>
      %141 = math.exp2 %140 : vector<256x1xf32>
      %142 = arith.mulf %61, %141 : vector<256x1xf32>
      %143 = arith.addf %136, %142 : vector<256x1xf32>
      %144 = vector.broadcast %141 : vector<256x1xf32> to vector<256x128xf32>
      %145 = arith.mulf %62, %144 : vector<256x128xf32>
      %146 = arith.addf %139, %145 : vector<256x128xf32>
      %147 = arith.subf %67, %117 : vector<256x1xf32>
      %148 = math.exp2 %147 : vector<256x1xf32>
      %149 = arith.mulf %73, %148 : vector<256x1xf32>
      %150 = arith.addf %143, %149 : vector<256x1xf32>
      %151 = vector.broadcast %148 : vector<256x1xf32> to vector<256x128xf32>
      %152 = arith.mulf %74, %151 : vector<256x128xf32>
      %153 = arith.addf %146, %152 : vector<256x128xf32>
      %154 = arith.subf %79, %117 : vector<256x1xf32>
      %155 = math.exp2 %154 : vector<256x1xf32>
      %156 = arith.mulf %85, %155 : vector<256x1xf32>
      %157 = arith.addf %150, %156 : vector<256x1xf32>
      %158 = vector.broadcast %155 : vector<256x1xf32> to vector<256x128xf32>
      %159 = arith.mulf %86, %158 : vector<256x128xf32>
      %160 = arith.addf %153, %159 : vector<256x128xf32>
      %161 = arith.subf %91, %117 : vector<256x1xf32>
      %162 = math.exp2 %161 : vector<256x1xf32>
      %163 = arith.mulf %97, %162 : vector<256x1xf32>
      %164 = arith.addf %157, %163 : vector<256x1xf32>
      %165 = vector.broadcast %162 : vector<256x1xf32> to vector<256x128xf32>
      %166 = arith.mulf %98, %165 : vector<256x128xf32>
      %167 = arith.addf %160, %166 : vector<256x128xf32>
      %168 = arith.subf %103, %117 : vector<256x1xf32>
      %169 = math.exp2 %168 : vector<256x1xf32>
      %170 = arith.mulf %109, %169 : vector<256x1xf32>
      %171 = arith.addf %164, %170 : vector<256x1xf32>
      %172 = vector.broadcast %169 : vector<256x1xf32> to vector<256x128xf32>
      %173 = arith.mulf %110, %172 : vector<256x128xf32>
      %174 = arith.addf %167, %173 : vector<256x128xf32>
      %175 = vector.broadcast %171 : vector<256x1xf32> to vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %118 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %175 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %174 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    %14 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %14 {
      %15 = vector.load %arg9[%c256, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %16 = vector.load %arg10[%c256, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %17 = vector.load %arg8[%c256, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>
      %18 = vector.extract_strided_slice %8 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %19 = vector.extract_strided_slice %10 {offsets = [0, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %20 = tpu.matmul %13, %18, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %21 = vector.multi_reduction <maximumf>, %20, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %22 = vector.shape_cast %21 : vector<256xf32> to vector<256x1xf32>
      %23 = vector.broadcast %22 : vector<256x1xf32> to vector<256x2048xf32>
      %24 = arith.subf %20, %23 : vector<256x2048xf32>
      %25 = math.exp2 %24 : vector<256x2048xf32>
      %26 = arith.truncf %25 : vector<256x2048xf32> to vector<256x2048xbf16>
      %27 = vector.multi_reduction <add>, %25, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %28 = vector.shape_cast %27 : vector<256xf32> to vector<256x1xf32>
      %29 = tpu.matmul %26, %19, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %30 = vector.extract_strided_slice %8 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %31 = vector.extract_strided_slice %10 {offsets = [2048, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %32 = tpu.matmul %13, %30, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %33 = vector.multi_reduction <maximumf>, %32, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %34 = vector.shape_cast %33 : vector<256xf32> to vector<256x1xf32>
      %35 = vector.broadcast %34 : vector<256x1xf32> to vector<256x2048xf32>
      %36 = arith.subf %32, %35 : vector<256x2048xf32>
      %37 = math.exp2 %36 : vector<256x2048xf32>
      %38 = arith.truncf %37 : vector<256x2048xf32> to vector<256x2048xbf16>
      %39 = vector.multi_reduction <add>, %37, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %40 = vector.shape_cast %39 : vector<256xf32> to vector<256x1xf32>
      %41 = tpu.matmul %38, %31, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %42 = vector.extract_strided_slice %8 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %43 = vector.extract_strided_slice %10 {offsets = [4096, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %44 = tpu.matmul %13, %42, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %45 = vector.multi_reduction <maximumf>, %44, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %46 = vector.shape_cast %45 : vector<256xf32> to vector<256x1xf32>
      %47 = vector.broadcast %46 : vector<256x1xf32> to vector<256x2048xf32>
      %48 = arith.subf %44, %47 : vector<256x2048xf32>
      %49 = math.exp2 %48 : vector<256x2048xf32>
      %50 = arith.truncf %49 : vector<256x2048xf32> to vector<256x2048xbf16>
      %51 = vector.multi_reduction <add>, %49, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %52 = vector.shape_cast %51 : vector<256xf32> to vector<256x1xf32>
      %53 = tpu.matmul %50, %43, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %54 = vector.extract_strided_slice %8 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %55 = vector.extract_strided_slice %10 {offsets = [6144, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %56 = tpu.matmul %13, %54, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %57 = vector.multi_reduction <maximumf>, %56, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %58 = vector.shape_cast %57 : vector<256xf32> to vector<256x1xf32>
      %59 = vector.broadcast %58 : vector<256x1xf32> to vector<256x2048xf32>
      %60 = arith.subf %56, %59 : vector<256x2048xf32>
      %61 = math.exp2 %60 : vector<256x2048xf32>
      %62 = arith.truncf %61 : vector<256x2048xf32> to vector<256x2048xbf16>
      %63 = vector.multi_reduction <add>, %61, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %64 = vector.shape_cast %63 : vector<256xf32> to vector<256x1xf32>
      %65 = tpu.matmul %62, %55, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %66 = vector.extract_strided_slice %8 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %67 = vector.extract_strided_slice %10 {offsets = [8192, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %68 = tpu.matmul %13, %66, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %69 = vector.multi_reduction <maximumf>, %68, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %70 = vector.shape_cast %69 : vector<256xf32> to vector<256x1xf32>
      %71 = vector.broadcast %70 : vector<256x1xf32> to vector<256x2048xf32>
      %72 = arith.subf %68, %71 : vector<256x2048xf32>
      %73 = math.exp2 %72 : vector<256x2048xf32>
      %74 = arith.truncf %73 : vector<256x2048xf32> to vector<256x2048xbf16>
      %75 = vector.multi_reduction <add>, %73, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %76 = vector.shape_cast %75 : vector<256xf32> to vector<256x1xf32>
      %77 = tpu.matmul %74, %67, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %78 = vector.extract_strided_slice %8 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %79 = vector.extract_strided_slice %10 {offsets = [10240, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %80 = tpu.matmul %13, %78, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %81 = vector.multi_reduction <maximumf>, %80, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %82 = vector.shape_cast %81 : vector<256xf32> to vector<256x1xf32>
      %83 = vector.broadcast %82 : vector<256x1xf32> to vector<256x2048xf32>
      %84 = arith.subf %80, %83 : vector<256x2048xf32>
      %85 = math.exp2 %84 : vector<256x2048xf32>
      %86 = arith.truncf %85 : vector<256x2048xf32> to vector<256x2048xbf16>
      %87 = vector.multi_reduction <add>, %85, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %88 = vector.shape_cast %87 : vector<256xf32> to vector<256x1xf32>
      %89 = tpu.matmul %86, %79, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %90 = vector.extract_strided_slice %8 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %91 = vector.extract_strided_slice %10 {offsets = [12288, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %92 = tpu.matmul %13, %90, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %93 = vector.multi_reduction <maximumf>, %92, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %94 = vector.shape_cast %93 : vector<256xf32> to vector<256x1xf32>
      %95 = vector.broadcast %94 : vector<256x1xf32> to vector<256x2048xf32>
      %96 = arith.subf %92, %95 : vector<256x2048xf32>
      %97 = math.exp2 %96 : vector<256x2048xf32>
      %98 = arith.truncf %97 : vector<256x2048xf32> to vector<256x2048xbf16>
      %99 = vector.multi_reduction <add>, %97, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %100 = vector.shape_cast %99 : vector<256xf32> to vector<256x1xf32>
      %101 = tpu.matmul %98, %91, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %102 = vector.extract_strided_slice %8 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %103 = vector.extract_strided_slice %10 {offsets = [14336, 0], sizes = [2048, 128], strides = [1, 1]} : vector<16384x128xbf16> to vector<2048x128xbf16>
      %104 = tpu.matmul %13, %102, %cst_4 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<256x128xbf16>, vector<2048x128xbf16>, vector<256x2048xf32> -> vector<256x2048xf32>
      %105 = vector.multi_reduction <maximumf>, %104, %cst_3 [1] : vector<256x2048xf32> to vector<256xf32>
      %106 = vector.shape_cast %105 : vector<256xf32> to vector<256x1xf32>
      %107 = vector.broadcast %106 : vector<256x1xf32> to vector<256x2048xf32>
      %108 = arith.subf %104, %107 : vector<256x2048xf32>
      %109 = math.exp2 %108 : vector<256x2048xf32>
      %110 = arith.truncf %109 : vector<256x2048xf32> to vector<256x2048xbf16>
      %111 = vector.multi_reduction <add>, %109, %cst_2 [1] : vector<256x2048xf32> to vector<256xf32>
      %112 = vector.shape_cast %111 : vector<256xf32> to vector<256x1xf32>
      %113 = tpu.matmul %110, %103, %cst_1 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<256x2048xbf16>, vector<2048x128xbf16>, vector<256x128xf32> -> vector<256x128xf32>
      %114 = arith.maximumf %22, %34 : vector<256x1xf32>
      %115 = arith.maximumf %114, %46 : vector<256x1xf32>
      %116 = arith.maximumf %115, %58 : vector<256x1xf32>
      %117 = arith.maximumf %116, %70 : vector<256x1xf32>
      %118 = arith.maximumf %117, %82 : vector<256x1xf32>
      %119 = arith.maximumf %118, %94 : vector<256x1xf32>
      %120 = arith.maximumf %119, %106 : vector<256x1xf32>
      %121 = vector.broadcast %120 : vector<256x1xf32> to vector<256x128xf32>
      %122 = arith.maximumf %15, %121 : vector<256x128xf32>
      %123 = vector.extract_strided_slice %122 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %124 = arith.subf %15, %122 : vector<256x128xf32>
      %125 = math.exp2 %124 : vector<256x128xf32>
      %126 = arith.subf %22, %123 : vector<256x1xf32>
      %127 = math.exp2 %126 : vector<256x1xf32>
      %128 = arith.mulf %28, %127 : vector<256x1xf32>
      %129 = arith.addf %128, %cst : vector<256x1xf32>
      %130 = vector.broadcast %127 : vector<256x1xf32> to vector<256x128xf32>
      %131 = arith.mulf %29, %130 : vector<256x128xf32>
      %132 = arith.addf %131, %cst_1 : vector<256x128xf32>
      %133 = arith.subf %34, %123 : vector<256x1xf32>
      %134 = math.exp2 %133 : vector<256x1xf32>
      %135 = arith.mulf %40, %134 : vector<256x1xf32>
      %136 = arith.addf %129, %135 : vector<256x1xf32>
      %137 = vector.broadcast %134 : vector<256x1xf32> to vector<256x128xf32>
      %138 = arith.mulf %41, %137 : vector<256x128xf32>
      %139 = arith.addf %132, %138 : vector<256x128xf32>
      %140 = arith.subf %46, %123 : vector<256x1xf32>
      %141 = math.exp2 %140 : vector<256x1xf32>
      %142 = arith.mulf %52, %141 : vector<256x1xf32>
      %143 = arith.addf %136, %142 : vector<256x1xf32>
      %144 = vector.broadcast %141 : vector<256x1xf32> to vector<256x128xf32>
      %145 = arith.mulf %53, %144 : vector<256x128xf32>
      %146 = arith.addf %139, %145 : vector<256x128xf32>
      %147 = arith.subf %58, %123 : vector<256x1xf32>
      %148 = math.exp2 %147 : vector<256x1xf32>
      %149 = arith.mulf %64, %148 : vector<256x1xf32>
      %150 = arith.addf %143, %149 : vector<256x1xf32>
      %151 = vector.broadcast %148 : vector<256x1xf32> to vector<256x128xf32>
      %152 = arith.mulf %65, %151 : vector<256x128xf32>
      %153 = arith.addf %146, %152 : vector<256x128xf32>
      %154 = arith.subf %70, %123 : vector<256x1xf32>
      %155 = math.exp2 %154 : vector<256x1xf32>
      %156 = arith.mulf %76, %155 : vector<256x1xf32>
      %157 = arith.addf %150, %156 : vector<256x1xf32>
      %158 = vector.broadcast %155 : vector<256x1xf32> to vector<256x128xf32>
      %159 = arith.mulf %77, %158 : vector<256x128xf32>
      %160 = arith.addf %153, %159 : vector<256x128xf32>
      %161 = arith.subf %82, %123 : vector<256x1xf32>
      %162 = math.exp2 %161 : vector<256x1xf32>
      %163 = arith.mulf %88, %162 : vector<256x1xf32>
      %164 = arith.addf %157, %163 : vector<256x1xf32>
      %165 = vector.broadcast %162 : vector<256x1xf32> to vector<256x128xf32>
      %166 = arith.mulf %89, %165 : vector<256x128xf32>
      %167 = arith.addf %160, %166 : vector<256x128xf32>
      %168 = arith.subf %94, %123 : vector<256x1xf32>
      %169 = math.exp2 %168 : vector<256x1xf32>
      %170 = arith.mulf %100, %169 : vector<256x1xf32>
      %171 = arith.addf %164, %170 : vector<256x1xf32>
      %172 = vector.broadcast %169 : vector<256x1xf32> to vector<256x128xf32>
      %173 = arith.mulf %101, %172 : vector<256x128xf32>
      %174 = arith.addf %167, %173 : vector<256x128xf32>
      %175 = arith.subf %106, %123 : vector<256x1xf32>
      %176 = math.exp2 %175 : vector<256x1xf32>
      %177 = arith.mulf %112, %176 : vector<256x1xf32>
      %178 = arith.addf %171, %177 : vector<256x1xf32>
      %179 = vector.broadcast %176 : vector<256x1xf32> to vector<256x128xf32>
      %180 = arith.mulf %113, %179 : vector<256x128xf32>
      %181 = arith.addf %174, %180 : vector<256x128xf32>
      %182 = arith.mulf %16, %125 : vector<256x128xf32>
      %183 = vector.broadcast %178 : vector<256x1xf32> to vector<256x128xf32>
      %184 = arith.addf %182, %183 : vector<256x128xf32>
      %185 = vector.extract_strided_slice %125 {offsets = [0, 0], sizes = [256, 1], strides = [1, 1]} : vector<256x128xf32> to vector<256x1xf32>
      %186 = vector.broadcast %185 : vector<256x1xf32> to vector<256x128xf32>
      %187 = arith.mulf %17, %186 : vector<256x128xf32>
      %188 = arith.addf %187, %181 : vector<256x128xf32>
      tpu.vector_store %arg9[%c256, %c0], %122 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg10[%c256, %c0], %184 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
      tpu.vector_store %arg8[%c256, %c0], %188 {strides = array<i32>} : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<256x128xf32>, 
    }
    scf.if %1 {
      %15 = vector.load %arg10[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x1xf32>
      %16 = vector.load %arg8[%c0, %c0] : memref<512x128xf32, #tpu.memory_space<vmem>>, vector<512x128xf32>
      %17 = vector.broadcast %15 : vector<512x1xf32> to vector<512x128xf32>
      %18 = arith.divf %16, %17 : vector<512x128xf32>
      %19 = arith.truncf %18 : vector<512x128xf32> to vector<512x128xbf16>
      %20 = vector.shape_cast %19 : vector<512x128xbf16> to vector<1x1x512x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %20 {strides = array<i32>} : memref<1x1x512x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x512x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

